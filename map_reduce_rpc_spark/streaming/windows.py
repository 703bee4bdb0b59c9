"""Watermarked window aggregations (tumbling + session).

Scale notes (100 TB/day of events): append mode + watermark bounds
state — closed windows are evicted as the watermark passes, so state
size is O(open windows), not O(history). Complete mode would retain
every window forever; never use it beyond a demo. The aggregations are
streaming-partial (per-batch partial aggs merge into state), so the
shuffle per batch carries one row per (window, key), not per event.
``countDistinct`` is unsupported in streaming — use
``approx_count_distinct`` (HLL state merges) when user counts are
needed and exactness isn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WATERMARK_DELAY = "10 minutes"
SESSION_GAP = "30 minutes"


def hourly_counts(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Tumbling 1-hour counts + value sum per event type — the
    streaming twin of plans/events.events_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes: each event lands in
    exactly two overlapping windows. State carries one row per open
    (window, type) — twice the tumbling footprint, still bounded by
    the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events")
    )


def static_enriched_hourly(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the stream against a broadcast
    static dimension (no state — the dim is re-broadcast per batch),
    then a watermarked tumbling count per segment."""
    return (
        events.withWatermark("ts", WATERMARK_DELAY)
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("segment"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(F.col("w.start").alias("hour"), "segment", "n_events", "value_cents")
    )


def dedup_stream(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Streaming dedup on event_id: first arrival wins, replays and
    duplicates are dropped — the at-least-once upstream contract this
    guards is the same one the reference's re-executing tasks rely on
    (SURVEY.md §2.3).

    ``dropDuplicatesWithinWatermark`` — NOT plain ``dropDuplicates`` —
    because the two differ exactly where 100 TB lives: plain
    dropDuplicates on keys that exclude the event-time column keeps
    every key's state FOREVER (the watermark only evicts when the
    time column is part of the dedup key, and including it would make
    same-id-different-ts replays pass through). WithinWatermark keys
    on event_id alone and still evicts each id once the watermark
    passes its event time + delay — bounded state, and duplicates
    from an at-least-once source arrive within the delay by
    definition. (Fixed late round 5; the prior form's docstring
    claimed the eviction it didn't have.)"""
    return (
        events.withWatermark("ts", watermark)
        .select("event_id", "ts", "user_id", "event_type")
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def purchase_click_join(
    clicks_src: DataFrame,
    purchases_src: DataFrame,
    watermark: str = WATERMARK_DELAY,
    horizon: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to every
    click by the same user in the preceding ``horizon``.

    Both sides are watermarked and the join carries an event-time range
    condition — the two things that let Spark bound join state: a click
    can be evicted once the watermark passes ``click_ts + horizon``
    (no future purchase can match it), so state is O(events per
    horizon), not O(stream history). Without the range condition the
    state grows forever and the query is rejected in append mode.
    Inner-join results emit as soon as both sides arrive; the watermark
    governs eviction, not emission.
    """
    joined = _interval_joined(clicks_src, purchases_src, watermark, horizon, "inner")
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


def click_attribution_outer(
    clicks_src: DataFrame,
    purchases_src: DataFrame,
    watermark: str = WATERMARK_DELAY,
    horizon: str = "30 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emitted,
    with its in-horizon purchases or null-extended if none arrive.

    Unlike the inner form, the null-extended rows are emitted by the
    WATERMARK, not by arrival: a click can only be declared
    purchase-less once the watermark on the purchase side has passed
    ``click_ts + horizon`` (no qualifying purchase can still arrive).
    The replay harness's sentinel chunks are what push the watermark
    there under ``AvailableNow`` — this query is the reason the
    watermark must be applied BEFORE the event-type filter (see
    ``_interval_joined``): filtered-out sentinels still advance it.
    """
    joined = _interval_joined(
        clicks_src, purchases_src, watermark, horizon, "left_outer"
    )
    return joined.select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


def click_purchase_full_outer(
    clicks_src: DataFrame,
    purchases_src: DataFrame,
    watermark: str = WATERMARK_DELAY,
    horizon: str = "30 minutes",
) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the join
    family (inner: purchase_click_join; left outer:
    click_attribution_outer): every click AND every purchase emitted,
    null-extended when the other side never arrives in the horizon
    (a purchase with no preceding click is an un-attributed conversion;
    a click with no following purchase is an abandoned one).

    Both unmatched directions are watermark-driven: a row can only be
    declared match-less once the OTHER side's watermark has passed the
    end of its horizon window, so state and emission timing are
    identical in shape to the left-outer case, just applied on both
    sides.
    """
    joined = _interval_joined(
        clicks_src, purchases_src, watermark, horizon, "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("c_user_id"), F.col("p_user_id")).alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


def converting_clicks_semi(
    clicks_src: DataFrame,
    purchases_src: DataFrame,
    watermark: str = WATERMARK_DELAY,
    horizon: str = "30 minutes",
) -> DataFrame:
    """Stream-stream LEFT SEMI interval join — the fourth member of
    the join family: each click emitted AT MOST ONCE iff any purchase
    by the same user follows within ``horizon``; purchase columns
    never surface. The semi form is the production shape for "did it
    convert" gating (funnels, billing triggers) because it cannot fan
    out on multiple matches — the engine emits the left row on its
    FIRST match and drops the rest, where an inner join would emit one
    row per matching purchase. State is bounded exactly as in the
    inner case (the range condition lets a click evict at
    click_ts + horizon)."""
    joined = _interval_joined(clicks_src, purchases_src, watermark, horizon, "left_semi")
    return joined.select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        F.unix_micros("click_ts").alias("click_us"),
    )


def _interval_joined(
    clicks_src: DataFrame,
    purchases_src: DataFrame,
    watermark: str,
    horizon: str,
    how: str,
) -> DataFrame:
    # The sentinel/heartbeat rows MUST survive the per-side event-type
    # filter: Catalyst pushes filters below the EventTimeWatermark
    # node, so a plain ``event_type = 'click'`` filter would drop the
    # sentinels before they reach the watermark statistics and the
    # watermark would stall at the last *click* — leaving the final
    # click's outer null-extension (and its state) pinned forever.
    # This is the streaming-punctuation rule: heartbeats advance event
    # time through every operator's input, so they are admitted here
    # and excluded from results after the join (sentinel user_id is -1
    # and never equals a real key, so the only sentinel matches are
    # sentinel-to-sentinel, filtered by the caller).
    clicks = (
        clicks_src.withWatermark("ts", watermark)
        .where(F.col("event_type").isin("click", "__sentinel__"))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        purchases_src.withWatermark("ts", watermark)
        .where(F.col("event_type").isin("purchase", "__sentinel__"))
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"""
            c_user_id = p_user_id AND
            purchase_ts >= click_ts AND
            purchase_ts < click_ts + INTERVAL {horizon}
            """
        ),
        how,
    )
    if how == "inner":
        joined = joined.withColumn("user_id", F.col("c_user_id"))
    return joined


def session_stats(events: DataFrame, gap: str = SESSION_GAP, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Gap-based sessions per user via the built-in ``session_window``:
    windows merge while consecutive events are < gap apart; start is the
    first event's ts. Value is summed in integer cents so the stream,
    the batch plan, and the DuckDB oracle agree bit-for-bit."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
            "value_cents",
        )
    )


def hdr_value_histogram(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Daily HDR-histogram sketch rows from the stream — the streaming
    producer of the mergeable quantile sketch that
    plans/events.hdr_quantile_rollup_values consumes in batch: state
    per open day is one row per OCCUPIED BUCKET (a few hundred),
    never per event, so the stateful footprint is the sketch itself.
    That is the point of streaming a mergeable summary: the stream
    maintains sketch state, sinks emit closed-day sketch rows, and any
    later rollup (week/month/all-time) merges rows without replay.

    Sentinel rows must reach the aggregation — a pre-agg filter that
    drops them can be pushed below the EventTimeWatermark node, and
    then nothing advances the clock that closes the final day window
    (observed: the last day never emits). So sentinels ride through
    the groupBy in a reserved bucket (-1) and the consumer drops that
    bucket after the drain — the same filter-after-drain contract as
    every other stream here, one level down."""
    from ..plans.events import _hdr_bucket

    is_sent = F.col("event_type") == "__sentinel__"
    return (
        events.withWatermark("ts", watermark)
        .withColumn("cents", F.floor(F.col("value") * 100).cast("long"))
        .where((F.col("cents") >= 1) | is_sent)
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            F.when(is_sent, F.lit(-1).cast("long"))
            .otherwise(_hdr_bucket("cents"))
            .alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("date").alias("day"), "bucket", "n")
    )
