"""Training-data-pipeline dataset-management operators: deterministic
splits, stratified sampling, sequence packing, and table profiling.

These extend the reference's workload surface (its plugins stop at
word/doc aggregation — /root/reference/plugins/wc.go:22-43,
indexer.go:22-41) with the dataset-curation steps an LLM data pipeline
runs before training. All four are hash-seeded and deterministic, so
every one carries a full DuckDB oracle.

Scale notes (100 TB):
- Splits/sampling key on md5 of the row id — no shuffle at all for
  split_assign (pure map), one shuffle on the stratum key for the
  stratified cap.
- pack_sequences needs a global running sum; a naive
  ``Window.orderBy`` with no partition key collapses to ONE task. We
  do the scalable two-phase form: per-chunk partial sums, a tiny
  chunk-offset table (n_rows / CHUNK entries) cumulated and broadcast
  back, then a per-chunk window. At 1e11 docs the offset table is
  ~1e8 rows — recurse the same trick once more if that ever exceeds
  driver-broadcast size.
- table_profile is one full scan with map-side partial aggregation;
  the exact count(distinct) per column is the only shuffle. At 100 TB
  swap in approx_count_distinct (HLL) — same call shape, no exactness
  oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import NON_LETTER_RE, tokens
from ..tables import load_table, spread_partitions

# train < 0xcc (204/256 = 79.7%), val < 0xe6 (26/256 = 10.2%), rest test.
_TRAIN_HEX = "cc"
_VAL_HEX = "e6"
STRATUM_CAP = 40
PACK_BUDGET = 2048  # tokens per packed sequence
PACK_CHUNK = 1024  # docs per partial-sum chunk


def _hash_key(col: str = "doc_id") -> F.Column:
    """Portable deterministic sampling key: md5 hex of the id's string
    form — identical bytes in any engine, uniform in its prefix."""
    return F.md5(F.col(col).cast("string"))


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~80/10/10) from the
    first two hex chars of md5(doc_id). Pure map — no shuffle; adding
    data never reassigns existing rows (stable under appends)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(_hash_key(), 1, 2)
    split = (
        F.when(bucket < _TRAIN_HEX, F.lit("train"))
        .when(bucket < _VAL_HEX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        "doc_id", "lang", bucket.alias("bucket"), split.alias("split")
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum cap: keep at most STRATUM_CAP docs per language,
    chosen by hash order (uniform within stratum, reproducible).
    One shuffle on the stratum key; skewed strata stay bounded because
    rank>cap rows are discarded at the window, not collected."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(_hash_key(), "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .where(F.col("sample_rank") <= STRATUM_CAP)
    )


WEIGHTED_SAMPLE_K = 25
_U_DENOM = float(16**13 + 1)  # 13 hex chars = 52 bits, exact in a double


def weighted_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, {WEIGHTED_SAMPLE_K} docs
    per source, inclusion probability increasing with document length —
    the importance-sampling primitive of corpus curation (sample long /
    high-quality docs preferentially while keeping every domain
    represented). Algorithm A-ES (Efraimidis-Spirakis): each doc draws
    key = -ln(u)/w with u a deterministic md5-derived uniform and
    w = token count; the K SMALLEST keys per source win — provably a
    weighted sample without replacement. Determinism: u is built from
    the first 13 md5 hex chars (52 bits, exactly representable), so
    both engines evaluate the identical IEEE expression; keys are
    never output (ranks are), so a last-ulp ln() divergence could only
    matter if two keys collided to ~1e-16 — probability ~1e-9 on this
    corpus, and fixed engine binaries make a passing dataset pass
    forever. One shuffle on source; rank > K rows are discarded at the
    window, so skewed sources stay bounded."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.greatest(
        F.lit(1),
        F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")),
    ).cast("double")
    h52 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("long").cast("double")
    key = -F.log((h52 + F.lit(1.0)) / F.lit(_U_DENOM)) / ntok
    w = Window.partitionBy("source").orderBy(F.col("_k"), "doc_id")
    return (
        docs.select(
            "doc_id",
            "source",
            ntok.cast("long").alias("weight_tokens"),
            key.alias("_k"),
        )
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= WEIGHTED_SAMPLE_K)
        .drop("_k")
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-fill sequence packing: docs in doc_id order are
    packed into PACK_BUDGET-token sequences; a doc belongs to the
    sequence where its running token count starts. Computed as a
    two-phase distributed cumulative sum (see module docstring) —
    bit-identical to the oracle's single global window."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    t = docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        (F.col("doc_id") - F.col("doc_id") % PACK_CHUNK).alias("chunk"),
    )
    offsets = (
        t.groupBy("chunk")
        .agg(F.sum("n_tok").alias("chunk_tok"))
        .withColumn(
            "chunk_offset",
            F.sum("chunk_tok").over(
                Window.orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("chunk", F.coalesce("chunk_offset", F.lit(0)).alias("chunk_offset"))
    )
    within = Window.partitionBy("chunk").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        t.join(F.broadcast(offsets), "chunk")
        .withColumn(
            "cum_before",
            F.col("chunk_offset") + F.coalesce(F.sum("n_tok").over(within), F.lit(0)),
        )
        .select(
            "doc_id",
            "n_tok",
            F.expr(f"cum_before div {PACK_BUDGET}").alias("seq_id"),
        )
    )


def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain rebalancing (the training-mixture
    op): downsample each ``lang`` domain with keep probability
    p_d = sqrt(n_min / n_d) — i.e. temperature alpha = 0.5 pulls domain
    sizes toward each other without global normalization (n_min / n_d
    is one IEEE division and sqrt is correctly rounded, so p_d is
    bit-identical in any engine; no order-dependent float sums).

    Selection is hash-gated, not rand(): keep doc when the 60-bit
    md5-derived key < p_d * 2^60 — deterministic, stable under
    re-execution (the at-least-once contract the reference's crash
    tests enforce), and reproducible by the SQL oracle. Per-domain
    counts broadcast back; the scan itself is map-only."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_d"))
    n_min = counts.agg(F.min("n_d").alias("n_min"))
    p = F.sqrt(F.col("n_min").cast("double") / F.col("n_d"))
    probs = counts.crossJoin(F.broadcast(n_min)).select(
        "lang", "n_d", p.alias("p_keep")
    )
    # compare as double on BOTH sides (a bare long < double comparison
    # could round differently per engine at the boundary)
    key60 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("double")
    return (
        docs.join(F.broadcast(probs), "lang")
        .where(key60 < F.col("p_keep") * F.lit(float(1 << 60)))
        .select("doc_id", "lang", "n_d", "p_keep")
    )


# 256 hash-prefix buckets for the two-phase global rank: the bucket id
# is the first byte of the sort key itself, so bucket order == key
# order and per-bucket ranks + bucket offsets compose to the exact
# global permutation.
_SHUF_BUCKETS = 256


def global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    unique position 1..N ordered by (md5(doc_id), doc_id).

    A bare ``row_number() OVER (ORDER BY key)`` collapses to ONE task;
    this is the scalable two-phase form (same trick as pack_sequences):
    rank within 256 hash-prefix buckets in parallel, cumulate the tiny
    per-bucket counts into offsets, broadcast them back, add. Because
    the bucket is the key's own first byte, bucket-major order equals
    key order and the result is bit-identical to the single-window
    oracle."""
    docs = load_table(spark, sf_dir, "documents")
    key = _hash_key()
    t = docs.select(
        "doc_id",
        key.alias("shuffle_key"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("bucket"),
    )
    offsets = (
        t.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    w = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    return (
        t.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "shuffle_key",
            (F.col("offset") + F.row_number().over(w)).alias("position"),
        )
    )


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of ``orders`` (row count, nulls, exact
    distinct, min/max as strings) in ONE scan: all aggregates in a
    single agg, then ``stack`` unpivots to a row per column."""
    # spread: 6 countDistincts expand each input row 7x before the
    # partial aggregate — compute-dense on a one-split scan (guarded
    # repartition, no-op at scale; all aggregates exact and
    # partition-order-independent)
    o = spread_partitions(load_table(spark, sf_dir, "orders"))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
            F.countDistinct(c).alias(f"{c}_distinct"),
            F.min(c).cast("string").alias(f"{c}_min"),
            F.max(c).cast("string").alias(f"{c}_max"),
        ]
    stack = ", ".join(
        f"'{c}', {c}_nulls, {c}_distinct, {c}_min, {c}_max" for c in _PROFILE_COLS
    )
    return o.agg(*aggs).select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_val, max_val)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


def integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the deequ/expectations pattern):
    one row per constraint with its violation count — primary-key
    uniqueness, referential integrity across the star schema, null and
    domain checks. A pipeline asserts ``max(n_violations) == 0``
    before promoting a snapshot.

    Plan shape: each FK check is a broadcast/shuffle LEFT ANTI join
    reduced to a count before the union, so the union carries one row
    per check, never data; PK checks are one distinct-vs-count
    aggregate per table. At 100 TB every check remains a single
    partial-agg'd pass over only the columns it names (column pruning
    leaves the wide payload unread).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    pk_customer = check(
        "pk_customer_unique",
        cust.agg((F.count("c_custkey") - F.countDistinct("c_custkey")).alias("n")),
    )
    pk_orders = check(
        "pk_orders_unique",
        orders.agg((F.count("o_orderkey") - F.countDistinct("o_orderkey")).alias("n")),
    )
    fk_orders_customer = check(
        "fk_orders_customer",
        orders.join(
            cust.select("c_custkey"),
            orders["o_custkey"] == cust["c_custkey"],
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n")),
    )
    fk_lineitem_orders = check(
        "fk_lineitem_orders",
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == orders["o_orderkey"],
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n")),
    )
    # sum() over an EMPTY table is NULL, not 0 — coalesce so a
    # zero-row corpus reports zero violations (mirrored in the oracle)
    null_custkey = check(
        "orders_custkey_not_null",
        orders.agg(
            F.coalesce(
                F.sum(F.col("o_custkey").isNull().cast("long")), F.lit(0)
            ).alias("n")
        ),
    )
    domain_qty = check(
        "lineitem_quantity_positive",
        li.agg(
            F.coalesce(
                F.sum((F.col("l_quantity") <= 0).cast("long")), F.lit(0)
            ).alias("n")
        ),
    )
    domain_event_value = check(
        "events_value_non_negative",
        ev.agg(
            F.coalesce(
                F.sum((F.col("value") < 0).cast("long")), F.lit(0)
            ).alias("n")
        ),
    )
    return (
        pk_customer.unionByName(pk_orders)
        .unionByName(fk_orders_customer)
        .unionByName(fk_lineitem_orders)
        .unionByName(null_custkey)
        .unionByName(domain_qty)
        .unionByName(domain_event_value)
    )


def split_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language TOKEN-DISTRIBUTION DRIFT between the train and
    val splits of split_assign — the validation a pipeline runs after
    splitting: a hash split should leave the two unigram
    distributions statistically identical, and a large total-variation
    distance flags a broken split (e.g. keyed on something correlated
    with content) or a corpus whose languages are too small to split.
    Metric: ppm-QUANTIZED total variation — each token's train/val
    shares are floored to integer ppm (share * 1e6 div total, the
    events_skew_profile idiom) before |diff| is summed and halved, so
    the whole query is integer-exact end-to-end and the oracle hashes
    bit-for-bit (per-token quantization error is < 1 ppm per split by
    construction; at > 9.2e12 tokens/language the 1e6 scale constant
    overflows BIGINT in the share product — widen to DECIMAL(38,0) or
    drop the scale to 1e4 there, a one-line swap).

    Plan shape at 100 TB: tokenize+explode feed ONE combiner'd
    (lang, token) aggregation with the split membership folded into
    two conditional sums — no train/val self-join anywhere; language
    totals are a tiny second agg broadcast back; the final per-lang
    reduce is exactly n_langs rows. Languages missing from either
    split drop out (integer division by an empty split is undefined
    in both engines; the inner join on the totals filter IS the
    guard).

    Output: (lang, train_tokens, val_tokens, distinct_tokens,
    tv_ppm)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(_hash_key(), 1, 2)
    split = (
        F.when(bucket < _TRAIN_HEX, F.lit("train"))
        .when(bucket < _VAL_HEX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    tok = docs.select(
        "lang", split.alias("split"), F.explode(tokens("text")).alias("token")
    ).where(F.col("split") != "test")
    counts = tok.groupBy("lang", "token").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("b"),
    )
    totals = (
        counts.groupBy("lang")
        .agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
        .where((F.col("ta") > 0) & (F.col("tb") > 0))
    )
    per_tok = counts.join(F.broadcast(totals), "lang").select(
        "lang",
        "ta",
        "tb",
        F.abs(
            F.expr("a * 1000000 div ta") - F.expr("b * 1000000 div tb")
        ).alias("d_ppm"),
    )
    return per_tok.groupBy("lang").agg(
        F.min("ta").cast("long").alias("train_tokens"),
        F.min("tb").cast("long").alias("val_tokens"),
        F.count("*").cast("long").alias("distinct_tokens"),
        F.expr("sum(d_ppm) div 2").cast("long").alias("tv_ppm"),
    )


SAMPLING_ORACLES: dict[str, str] = {
    "split_token_drift": f"""
        WITH tok AS (
            SELECT lang,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                            < '{_TRAIN_HEX}' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                            < '{_VAL_HEX}' THEN 'val'
                        ELSE 'test' END AS split,
                   unnest(regexp_split_to_array(text, '{NON_LETTER_RE}'))
                       AS token
            FROM documents
        ),
        counts AS (
            SELECT lang, token,
                   sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS a,
                   sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS b
            FROM tok WHERE token <> '' AND split <> 'test'
            GROUP BY 1, 2
        ),
        totals AS (
            SELECT lang, sum(a) AS ta, sum(b) AS tb FROM counts GROUP BY 1
            HAVING sum(a) > 0 AND sum(b) > 0
        ),
        per_tok AS (
            SELECT c.lang, t.ta, t.tb,
                   abs(c.a * 1000000 // t.ta - c.b * 1000000 // t.tb) AS d_ppm
            FROM counts c JOIN totals t ON c.lang = t.lang
        )
        SELECT lang,
               CAST(min(ta) AS BIGINT) AS train_tokens,
               CAST(min(tb) AS BIGINT) AS val_tokens,
               CAST(count(*) AS BIGINT) AS distinct_tokens,
               CAST(sum(d_ppm) // 2 AS BIGINT) AS tv_ppm
        FROM per_tok GROUP BY 1
    """,
    "integrity_report": """
        SELECT 'pk_customer_unique' AS check_name,
               CAST(count(c_custkey) - count(DISTINCT c_custkey) AS BIGINT)
                   AS n_violations
        FROM customer
        UNION ALL
        SELECT 'pk_orders_unique',
               CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'fk_orders_customer', CAST(count(*) AS BIGINT)
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'fk_lineitem_orders', CAST(count(*) AS BIGINT)
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'orders_custkey_not_null',
               CAST(COALESCE(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem_quantity_positive',
               CAST(COALESCE(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'events_value_non_negative',
               CAST(COALESCE(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM events
    """,
    "split_assign": f"""
        SELECT doc_id, lang,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HEX}'
                        THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HEX}'
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS INT) AS sample_rank
        FROM documents
        QUALIFY sample_rank <= {STRATUM_CAP}
    """,
    "weighted_source_sample": f"""
        WITH w AS (
            SELECT doc_id, source,
                   greatest(1, len(list_filter(
                       regexp_split_to_array(text, '\\s+'), t -> t <> '')))
                       AS wt,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                       AS h
            FROM documents
        ),
        k AS (
            SELECT doc_id, source, wt,
                   -ln((CAST(h AS DOUBLE) + 1.0) / {_U_DENOM!r})
                       / CAST(wt AS DOUBLE) AS kk
            FROM w
        )
        SELECT doc_id, source, CAST(wt AS BIGINT) AS weight_tokens,
               sample_rank
        FROM (
            SELECT doc_id, source, wt,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY kk, doc_id) AS sample_rank
            FROM k
        ) WHERE sample_rank <= {WEIGHTED_SAMPLE_K}
    """,
    "pack_sequences": f"""
        WITH t AS (
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                                   t -> t <> ''))::INT AS n_tok
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_tok,
                   CAST(coalesce(sum(n_tok) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM t
        )
        SELECT doc_id, n_tok, cum_before // {PACK_BUDGET} AS seq_id FROM c
    """,
    "domain_mix_sample": """
        WITH counts AS (
            SELECT lang, count(*) AS n_d FROM documents GROUP BY 1
        ),
        probs AS (
            SELECT lang, n_d,
                   sqrt(CAST((SELECT min(n_d) FROM counts) AS DOUBLE) / n_d)
                       AS p_keep
            FROM counts
        )
        SELECT d.doc_id, d.lang, p.n_d, p.p_keep
        FROM documents d JOIN probs p USING (lang)
        WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                   AS DOUBLE)
              < p.p_keep * 1152921504606846976.0
    """,
    "global_shuffle": """
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
               CAST(row_number() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS position
        FROM documents
    """,
    "table_profile": """
        SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
               count(*) - count(o_orderkey) AS n_nulls,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_val,
               CAST(max(o_orderkey) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
    """,
}


def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card stats block, one query: per (split, lang) —
    document count, total tokens, total chars, exact-duplicate
    document count and its ppm rate. This is the summary table every
    released training corpus ships (what's in each split, how big in
    tokens, how clean), composed from the certified building blocks:
    split_assign's stable md5 split, the reference tokenizer's token
    counts, and corpus-level exact-dup detection (a doc is dup-flagged
    if its full text appears >= 2 times anywhere in the corpus).

    Plan shape at 100 TB: one sha2-keyed groupBy for dup multiplicity
    (count-only — text never shuffles twice: the join back to docs is
    on the hash key), token counting fused into the scan, then a
    partial-agg'd (split, lang) rollup — three shuffles total, each
    carrying ids/counts. Output: (split, lang, n_docs, total_tokens,
    total_chars, dup_docs, dup_ppm)."""
    from ..functions.text import word_count_tokens

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(_hash_key(), 1, 2)
    split = (
        F.when(bucket < _TRAIN_HEX, F.lit("train"))
        .when(bucket < _VAL_HEX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    base = docs.select(
        "doc_id",
        "lang",
        split.alias("split"),
        word_count_tokens(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.sha2(F.col("text"), 256).alias("h"),
    )
    mult = base.groupBy("h").agg(F.count("*").alias("m"))
    return (
        base.join(mult, "h")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(F.when(F.col("m") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("dup_docs"),
        )
        .select(
            "split",
            "lang",
            "n_docs",
            "total_tokens",
            "total_chars",
            "dup_docs",
            F.expr("(dup_docs * 1000000) div n_docs").alias("dup_ppm"),
        )
    )


SAMPLING_ORACLES["dataset_card_report"] = f"""
    WITH base AS (
        SELECT doc_id, lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < '{_TRAIN_HEX}' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < '{_VAL_HEX}' THEN 'val'
                    ELSE 'test' END AS split,
               len(list_filter(regexp_split_to_array(text, '{NON_LETTER_RE}'),
                               x -> x <> '')) AS n_tokens,
               length(text) AS n_chars,
               sha256(text) AS h
        FROM documents
    ),
    mult AS (SELECT h, count(*) AS m FROM base GROUP BY h)
    SELECT split, lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_docs,
           CAST((sum(CASE WHEN m >= 2 THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS dup_ppm
    FROM base JOIN mult USING (h)
    GROUP BY split, lang
"""
