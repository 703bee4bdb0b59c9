"""Loaders for the test star schema (see /root/repo/TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.

All loads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free; at 100 TB these would be
partitioned/bucketed table roots instead of single files, but the call
surface is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # Some testdata generations store ts as TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects unless this legacy conf is
        # on. Set it at runtime so ANY session (including
        # externally-constructed ones) can read it — relying on the
        # session builder alone breaks callers that bring their own
        # SparkSession. Runtime-settable conf; no-op if already set.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin the session tz so the NTZ->LTZ normalization below (and
        # every downstream hour/date extraction) is value-identical to
        # DuckDB's naive reading even under an externally-built session
        # (the driver brings its own). session.py already sets UTC.
        # SESSION-WIDE side effect, so: only when it differs, with a
        # warning — a caller whose session deliberately runs in another
        # timezone should see the mutation, not discover it later.
        if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
            import warnings

            warnings.warn(
                "load_table('events') sets spark.sql.session.timeZone=UTC "
                "for the WHOLE session (required for oracle-identical "
                "timestamp semantics); your session had a different zone",
                RuntimeWarning,
                stacklevel=2,
            )
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to TIMESTAMP (LTZ) micros whatever the parquet
        # physical type of this testdata generation:
        #   - TIMESTAMP(NANOS) read via nanosAsLong -> bigint: integer-
        #     div to micros (exact — no double roundtrip), matching
        #     DuckDB's nanos->micros truncation.
        #   - timestamp[us] without tz -> TIMESTAMP_NTZ: cast to LTZ.
        #     The session timezone is pinned to UTC (session.py), so
        #     the cast is value-identical to DuckDB's naive reading.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread_partitions(df: DataFrame, probe: DataFrame | None = None) -> DataFrame:
    """Ensure compute-dense map work is not serialized by a
    small-split scan.

    A parquet table smaller than ``spark.sql.files.maxPartitionBytes``
    scans as ONE partition, so everything fused into the scan stage
    (tokenization, hashing, n-gram explosion) runs on one core while
    the rest idle — the classic compute-per-byte / split-size
    mismatch. Guarded: only repartitions when the scan yields fewer
    splits than ``defaultParallelism``, so at 100 TB (thousands of
    splits) this is a no-op and no shuffle is added. The shuffle it
    does add at small scale moves raw input bytes once — trivially
    cheaper than leaving (cores - 1) idle through the expensive map.

    PRECONDITION: the partition count is probed via
    ``df.rdd.getNumPartitions()``, which under AQE can eagerly
    materialize query stages when the plan contains exchanges — so
    the probed frame must be a NARROW scan/projection (no join, no
    aggregate, no repartition upstream). Callers whose compute-dense
    frame is NOT narrow (e.g. a pruned semi-join of a small scan)
    pass that narrow source as ``probe``: the split-count decision is
    read from the probe while the repartition applies to ``df`` — at
    scale the probe has many splits and the whole call no-ops.
    """
    src = probe if probe is not None else df
    target = src.sparkSession.sparkContext.defaultParallelism
    if scan_is_small(src, target):
        return df.repartition(target)
    return df


def _max_partition_bytes(spark: SparkSession) -> int:
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    units = {"k": 10, "m": 20, "g": 30, "b": 0}
    s = raw.strip().lower()
    if s.endswith("b") and len(s) > 1 and s[-2] in units:
        s = s[:-1]
    mult = 1 << units.get(s[-1], 0) if s[-1] in units else 1
    digits = s.rstrip("kmgb")
    try:
        return int(digits) * mult
    except ValueError:
        return 128 << 20


def scan_is_small(src: DataFrame, target: int) -> bool:
    """True when ``src``'s file scan will plan fewer splits than
    ``target``. Probed from the scan's FILE LIST (``inputFiles()`` +
    local stat), not ``df.rdd.getNumPartitions()``: the .rdd probe
    forces a full Catalyst plan -> RDD conversion (~0.12-0.15 s of
    single-threaded driver time per call, measured round 15, paid on
    EVERY query construction that consults the guard) where the file
    listing is ~2-4 ms. Decision rule: many files (>= target) or
    enough bytes to fill >= target splits of maxPartitionBytes means
    the scan parallelizes on its own -> not small. Any failure to
    list/stat (non-file source, remote fs) falls back to the exact
    .rdd probe, so the decision is never WRONG, only occasionally
    slower to make."""
    try:
        files = src.inputFiles()
        if not files:
            return src.rdd.getNumPartitions() < target
        max_split = _max_partition_bytes(src.sparkSession)
        open_cost = 4 << 20  # spark.sql.files.openCostInBytes default
        if len(files) * open_cost >= target * max_split:
            # enough files that open-cost alone fills >= target splits
            # under Spark's packing formula — skip the stat loop
            return False
        total = 0
        for f in files:
            p = f[7:] if f.startswith("file:") and f[5:7] == "//" else (
                f[5:] if f.startswith("file:") else f
            )
            total += os.path.getsize(p)
        # Spark packs files into splits of maxPartitionBytes charging
        # each file openCostInBytes on top of its size; the scan is
        # "small" when the packed cost cannot fill target splits.
        return total + len(files) * open_cost < target * max_split
    except Exception:
        return src.rdd.getNumPartitions() < target


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def derived_cache_dir(sf_dir: str, name: str, tables: tuple[str, ...], build) -> str:
    """Build-once /tmp cache for a query's derived copy of the
    testdata (month-partitioned orders, avro mirror, ...), safe
    against the two failure modes a naive path-keyed cache has:

    - **stale serves**: the tag fingerprints size+mtime of the source
      parquet(s), so regenerating testdata in place invalidates the
      copy instead of silently serving old rows;
    - **concurrent builders** (bench + pytest): ``build`` writes to a
      pid-suffixed temp dir that is atomically renamed into place;
      the rename loser discards its copy and reuses the winner's
      (same fingerprint => equivalent contents).

    ``build(tmp_path)`` must create ``tmp_path`` with a ``_SUCCESS``
    marker inside.
    """
    import hashlib
    import shutil

    fp = hashlib.md5(f"{name}:{sf_dir}".encode())
    for tbl in tables:
        src = os.path.join(sf_dir, f"{tbl}.parquet")
        try:
            entries = sorted(os.listdir(src)) if os.path.isdir(src) else [src]
            for e in entries:
                p = e if os.path.isabs(e) else os.path.join(src, e)
                st = os.stat(p)
                fp.update(f"{e}:{st.st_size}:{st.st_mtime_ns}".encode())
        except OSError:
            pass  # unreadable source: path-only tag
    path = f"/tmp/spark_graft_{name}_{fp.hexdigest()[:12]}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build.{os.getpid()}"
        build(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return path
