"""Transactional-table (sources/txlog.py) contracts: atomic commits,
snapshot isolation + time travel, file-level delete, optimistic
concurrency under a real commit race, crash garbage invisibility,
and vacuum safety."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import txlog


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tx")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    txlog.create_table(spark, root, df.repartition(4))
    return root


def test_create_read_append_time_travel(spark, table):
    assert txlog.current_version(table) == 0
    assert txlog.read_table(spark, table).count() == 1000

    more = spark.range(1000, 1250).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    v = txlog.append(spark, table, more)
    assert v == 1
    assert txlog.read_table(spark, table).count() == 1250
    # time travel: v0 is still exactly v0
    assert txlog.read_table(spark, table, version=0).count() == 1000


def test_delete_rewrites_only_victim_files(spark, table):
    # victims live in bucket 3 only; with 4 input partitions each file
    # holds several buckets, so SOME files carry over untouched once
    # we append a victim-free file first
    clean = spark.range(5000, 5100).select(
        F.col("id"), F.lit(99).alias("bucket")
    )
    txlog.append(spark, table, clean.coalesce(1))
    before = set(txlog.snapshot_info(table, 1)["files"])
    v = txlog.delete_where(spark, table, "bucket = 3")
    m = json.load(open(txlog._manifest_path(table, v)))
    after = set(txlog.snapshot_info(table, v)["files"])
    # the clean appended file is carried by NAME, not rewritten
    carried = before & after
    assert carried, "no file carried over — delete rewrote everything"
    assert m["carried"] >= 1 and m["rewrote"] >= 1
    got = txlog.read_table(spark, table)
    assert got.where("bucket = 3").count() == 0
    assert got.count() == 1000 - 100 + 100  # 100 victims out, 100 clean in
    # time travel still sees the victims at the old version
    assert (
        txlog.read_table(spark, table, version=1).where("bucket = 3").count()
        == 100
    )


def test_concurrent_appends_both_survive(spark, table):
    """Two writers race the same parent version: exclusive-create lets
    exactly one claim each version; the loser retries on top. Both
    payloads must land, in two distinct versions."""
    errs: list[Exception] = []

    def add(lo: int) -> None:
        try:
            df = spark.range(lo, lo + 500).select(
                F.col("id"), F.lit(-1).alias("bucket")
            )
            txlog.append(spark, table, df)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=add, args=(10_000,))
    t2 = threading.Thread(target=add, args=(20_000,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert txlog.current_version(table) == 2
    got = txlog.read_table(spark, table)
    assert got.where("id >= 10000 and id < 10500").count() == 500
    assert got.where("id >= 20000 and id < 20500").count() == 500
    assert got.count() == 2000


def test_crash_garbage_is_invisible_and_vacuumable(spark, table):
    """Files staged by a writer that died before its commit point must
    never be read; vacuum removes them only once they AGE past the
    in-flight-writer guard (a young never-referenced file is
    indistinguishable from a LIVE writer's staged batch — round-12
    ADVICE), so the crash is simulated and then aged."""
    import os
    import time as _time

    # simulate the crash: stage files, then 'die' (no manifest)
    orphan = spark.range(0, 10).select(
        F.col("id"), F.lit(7).alias("bucket")
    )
    staged = txlog._stage_files(spark, table, orphan)
    assert txlog.read_table(spark, table).count() == 1000  # unchanged
    # young never-referenced files are protected: could be live writer
    assert txlog.vacuum(table) == []
    for rel in staged:
        assert os.path.exists(os.path.join(table, rel))
    # age them past the guard: now they are crash garbage
    old = _time.time() - 2 * txlog._TMP_RETAIN_SECS
    for rel in staged:
        os.utime(os.path.join(table, rel), (old, old))
    removed = txlog.vacuum(table)
    assert sorted(removed) == sorted(staged)
    assert txlog.read_table(spark, table).count() == 1000


def test_vacuum_respects_retained_versions(spark, table):
    txlog.append(
        spark,
        table,
        spark.range(9000, 9010).select(
            F.col("id"), F.lit(0).alias("bucket")
        ),
    )
    txlog.delete_where(spark, table, "id >= 9000")
    # retain current + previous: both must stay readable
    txlog.vacuum(table, retain_versions=2)
    assert txlog.read_table(spark, table).count() == 1000
    assert txlog.read_table(spark, table, version=1).count() == 1010


def test_fully_deleted_table_reads_typed_empty(spark, tmp_path):
    root = str(tmp_path / "tx2")
    txlog.create_table(
        spark, root, spark.range(0, 5).select(F.col("id"))
    )
    txlog.delete_where(spark, root, "id >= 0")
    got = txlog.read_table(spark, root)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id"]


def test_append_enforces_schema(spark, table):
    """Write-side schema contract: int literals are cast to the
    table's long columns (no mixed parquet physical types across
    files), and a wrong column set is a loud error, never silent
    evolution."""
    txlog.append(
        spark,
        table,
        spark.range(7000, 7003).select(
            F.col("id"), F.lit(1).alias("bucket")  # int literal -> cast long
        ),
    )
    got = txlog.read_table(spark, table)
    assert dict(got.dtypes)["bucket"] == "bigint"
    assert got.count() == 1003
    with pytest.raises(ValueError, match="schema mismatch"):
        txlog.append(
            spark, table, spark.range(3).select(F.col("id"))  # missing col
        )


def test_merge_upsert_one_atomic_version(spark, table):
    """MERGE: matched keys replaced, unmatched inserted, ONE version;
    only files containing matched keys are rewritten."""
    # a clean single file appended first: no merge key lands in it, so
    # it must carry over by name
    clean = spark.range(5000, 5100).select(
        F.col("id"), F.lit(99).alias("bucket")
    )
    txlog.append(spark, table, clean.coalesce(1))
    before = set(txlog.snapshot_info(table, 1)["files"])
    updates = spark.range(0, 50).select(
        F.col("id"), F.lit(-5).alias("bucket")
    ).union(
        spark.range(90_000, 90_025).select(
            F.col("id"), F.lit(-6).alias("bucket")
        )
    )
    v = txlog.merge(spark, table, updates, ("id",))
    assert v == 2
    m = json.load(open(txlog._manifest_path(table, v)))
    assert m["op"] == "merge"
    carried = before & set(txlog.snapshot_info(table, v)["files"])
    assert carried, "no file carried over — merge rewrote everything"
    assert m["rewrote"] >= 1 and m["carried"] >= 1
    got = txlog.read_table(spark, table)
    assert got.count() == 1100 + 25  # 50 replaced in place, 25 inserted
    assert got.where("bucket = -5").count() == 50
    assert got.where("bucket = -6").count() == 25
    assert got.where("id < 50 and bucket >= 0").count() == 0
    # snapshot isolation: the pre-merge version still has the old rows
    assert (
        txlog.read_table(spark, table, version=1)
        .where("id < 50 and bucket >= 0")
        .count()
        == 50
    )


def test_merge_idempotent_and_key_unique(spark, table):
    df = spark.range(0, 10).select(F.col("id"), F.lit(-1).alias("bucket"))
    v1 = txlog.merge(spark, table, df, ("id",), app_id="cdc", txn_version=0)
    v_dup = txlog.merge(
        spark, table, df, ("id",), app_id="cdc", txn_version=0
    )
    assert v_dup == v1  # redelivered CDC batch: no new version
    assert txlog.read_table(spark, table).count() == 1000
    with pytest.raises(ValueError, match="key-unique"):
        txlog.merge(spark, table, df.union(df), ("id",))


def test_concurrent_merges_serialize(spark, table):
    """Two writers MERGE disjoint key sets against the same parent
    version: the commit race serializes them into two versions, both
    payloads land, and the loser's re-probe sees the winner's rows
    (so neither merge clobbers the other's rewrite)."""
    errs: list[Exception] = []

    def upsert(lo: int, mark: int) -> None:
        try:
            df = spark.range(lo, lo + 100).select(
                F.col("id"), F.lit(mark).alias("bucket")
            )
            txlog.merge(spark, table, df, ("id",))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    # writer A updates ids 0-99, writer B updates 100-199: disjoint
    # KEYS, but both ranges live in the SAME data files, so the loser
    # must re-probe and rewrite on top of the winner's commit
    t1 = threading.Thread(target=upsert, args=(0, -7))
    t2 = threading.Thread(target=upsert, args=(100, -8))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert txlog.current_version(table) == 2
    got = txlog.read_table(spark, table)
    assert got.count() == 1000
    assert got.where("bucket = -7").count() == 100
    assert got.where("bucket = -8").count() == 100
    assert got.where("id < 200 and bucket >= 0").count() == 0


def test_read_changes_appends_deletes_merges(spark, table):
    """CDF from manifest diffs: appends emit inserts, deletes emit
    exactly the victims, merges emit delete+insert pairs for updates."""
    txlog.append(
        spark,
        table,
        spark.range(1000, 1100).select(
            F.col("id"), (F.col("id") % 10).alias("bucket")
        ),
    )  # v1
    txlog.delete_where(spark, table, "bucket = 3")  # v2
    txlog.merge(
        spark,
        table,
        spark.range(0, 5).select(F.col("id"), F.lit(-1).alias("bucket")),
        ("id",),
    )  # v3: 5 updates (bucket 0 rows replaced)
    cdf = txlog.read_changes(spark, table, 0)
    by = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in cdf.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert by[(1, "insert")] == 100
    assert by[(2, "delete")] == 110  # bucket 3: 100 original + 10 appended
    assert (2, "insert") not in by  # survivors cancel via exceptAll
    # id=3 (bucket 3) was already deleted at v2, so the merge replaces
    # 4 rows (delete+insert pairs) and inserts 1 brand-new row
    assert by[(3, "insert")] == 5 and by[(3, "delete")] == 4
    # incremental consumption: catching up from v2 sees only v3
    tail = txlog.read_changes(spark, table, 2)
    assert tail.count() > 0
    assert tail.where("_commit_version != 3").count() == 0
    # replaying the CDF over the v0 snapshot reproduces the v3 snapshot
    v0 = txlog.read_table(spark, table, version=0)
    ins = cdf.where("_change_type = 'insert'").drop(
        "_change_type", "_commit_version"
    )
    dels = cdf.where("_change_type = 'delete'").drop(
        "_change_type", "_commit_version"
    )
    replayed = v0.unionByName(ins).exceptAll(dels)
    assert (
        replayed.exceptAll(txlog.read_table(spark, table)).count() == 0
        and txlog.read_table(spark, table).exceptAll(replayed).count() == 0
    )


def test_optimize_commit_pinned_readers_and_empty_cdf(spark, table):
    """OPTIMIZE: fewer files, identical rows, a pinned reader's file
    list is untouched until vacuum, and the change feed is empty."""
    for lo in (2000, 3000, 4000):
        txlog.append(
            spark,
            table,
            spark.range(lo, lo + 10).select(
                F.col("id"), F.lit(0).alias("bucket")
            ).coalesce(1),
        )
    v_pin = txlog.current_version(table)
    n_files_before = len(txlog.snapshot_info(table, v_pin)["files"])
    pinned = txlog.read_table(spark, table, version=v_pin)
    v_opt = txlog.optimize(spark, table)
    m = json.load(open(txlog._manifest_path(table, v_opt)))
    assert m["op"] == "optimize"
    assert len(m["files"]) < n_files_before
    assert txlog.read_table(spark, table).count() == 1030
    # the pinned snapshot still reads its ORIGINAL files
    assert pinned.count() == 1030
    assert txlog.read_changes(spark, table, v_pin, v_opt).count() == 0


def test_schema_evolution_append_and_time_travel(spark, table):
    """merge_schema append widens the table; old files read as NULL
    for the new column; time travel before the evolution shows the
    OLD schema; strict appends still work post-evolution."""
    v_old = txlog.current_version(table)
    wide = spark.range(1000, 1010).select(
        F.col("id"),
        F.lit(1).alias("bucket"),
        F.lit("src-a").alias("source"),
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        txlog.append(spark, table, wide)
    v = txlog.append(spark, table, wide, merge_schema=True)
    got = txlog.read_table(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "bucket", "source"]
    assert got.where("source IS NULL").count() == 1000
    assert got.where("source = 'src-a'").count() == 10
    # time travel: the pre-evolution snapshot has the old 2-col shape
    old = txlog.read_table(spark, table, version=v_old)
    assert [f.name for f in old.schema.fields] == ["id", "bucket"]
    # a narrow append now must fill the evolved column with NULLs
    txlog.append(
        spark,
        table,
        spark.range(2000, 2005).select(
            F.col("id"), F.lit(2).alias("bucket")
        ),
        merge_schema=True,
    )
    assert txlog.read_table(spark, table).where(
        "id >= 2000 AND source IS NULL"
    ).count() == 5
    # delete across the evolution keeps the evolved schema readable
    txlog.delete_where(spark, table, "bucket = 2")
    got = txlog.read_table(spark, table)
    assert got.where("id >= 2000").count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "bucket", "source"]
    assert got.where("source = 'src-a'").count() == 10
    assert v == v_old + 1


def test_vacuum_sweeps_stale_tmp_manifests(spark, table):
    import time as _time

    log_dir = txlog._log_dir(table)
    stale = f"{log_dir}/.tmp-deadbeef0000.json"
    with open(stale, "w") as fh:
        fh.write("{}")
    old = _time.time() - 2 * txlog._TMP_RETAIN_SECS
    os.utime(stale, (old, old))
    fresh = f"{log_dir}/.tmp-deadbeef1111.json"
    with open(fresh, "w") as fh:
        fh.write("{}")
    removed = txlog.vacuum(table)
    assert any(".tmp-deadbeef0000" in r for r in removed)
    assert os.path.exists(fresh)  # a live writer's window is untouched
    os.remove(fresh)


def test_idempotent_txn_append(spark, table):
    """The Delta txnAppId pattern: a redelivered (app_id, txn_version)
    append is a no-op; a NEWER txn_version for the same app commits;
    versions from different apps don't interfere."""
    df = spark.range(0, 10).select(F.col("id"), F.lit(1).alias("bucket"))
    v1 = txlog.append(spark, table, df, app_id="etl", txn_version=0)
    v_dup = txlog.append(spark, table, df, app_id="etl", txn_version=0)
    assert v_dup == v1  # duplicate delivery: no new version
    assert txlog.read_table(spark, table).count() == 1010
    v2 = txlog.append(spark, table, df, app_id="etl", txn_version=1)
    assert v2 == v1 + 1
    v3 = txlog.append(spark, table, df, app_id="other", txn_version=0)
    assert v3 == v2 + 1  # a different app's version space
    assert txlog.read_table(spark, table).count() == 1030
    # idempotence survives an interleaved delete (txn map carried)
    txlog.delete_where(spark, table, "bucket = 1")
    v_dup2 = txlog.append(spark, table, df, app_id="etl", txn_version=1)
    assert v_dup2 == txlog.current_version(table)
    assert txlog.read_table(spark, table).where("bucket = 1").count() == 0


def test_optimize_cluster_by_restores_file_skipping(spark, tmp_path):
    """OPTIMIZE with cluster_by: after unclustered appends scatter the
    key space (every file spans the full id range), a clustered
    optimize gives each file a narrow disjoint range — measured on the
    REAL parquet footers: a narrow id predicate overlaps every
    pre-optimize file but at most half of the post-optimize files."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "tx")
    # 4 round-robin files, each covering the FULL id range (worst-case
    # scatter — what a stream of unclustered appends converges to)
    txlog.create_table(
        spark,
        root,
        spark.range(0, 4000).select(
            F.col("id"), (F.col("id") % 7).alias("bucket")
        ).repartition(4),
    )

    def files_overlapping(version, lo, hi):
        m = json.load(open(txlog._manifest_path(root, version)))
        n_overlap, n_total = 0, 0
        for rel in m["files"]:
            md = pq.read_metadata(os.path.join(root, rel))
            fmin = min(
                md.row_group(i).column(0).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(0).statistics.max
                for i in range(md.num_row_groups)
            )
            n_total += 1
            if fmin <= hi and fmax >= lo:
                n_overlap += 1
        return n_overlap, n_total

    v0_overlap, v0_total = files_overlapping(0, 100, 200)
    assert v0_overlap == v0_total  # every scattered file spans the range
    v = txlog.optimize(
        spark, root, target_file_bytes=8 << 10, cluster_by=("id",)
    )
    m = json.load(open(txlog._manifest_path(root, v)))
    assert m["cluster_by"] == ["id"]
    v1_overlap, v1_total = files_overlapping(v, 100, 200)
    assert v1_total >= 2
    assert v1_overlap <= v1_total // 2
    # logical content identical
    got = txlog.read_table(spark, root)
    assert got.count() == 4000
    assert got.agg(F.sum("id")).first()[0] == 4000 * 3999 // 2


def test_read_changes_across_schema_evolution(spark, tmp_path):
    """A change feed spanning an evolution commit binds every row to
    the TO-version schema: pre-evolution inserts surface typed NULLs
    for the later column, post-evolution inserts carry their values."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 10).select(F.col("id"), F.lit(0).alias("bucket")),
    )
    txlog.append(
        spark,
        root,
        spark.range(10, 15).select(
            F.col("id"), F.lit(1).alias("bucket"), F.lit("s1").alias("source")
        ),
        merge_schema=True,
    )
    cdf = txlog.read_changes(spark, root, from_version=-1)
    assert set(cdf.columns) == {
        "id", "bucket", "source", "_change_type", "_commit_version"
    }
    assert cdf.count() == 15
    assert cdf.where("_change_type != 'insert'").count() == 0
    assert cdf.where("_commit_version = 0 AND source IS NULL").count() == 10
    assert cdf.where("_commit_version = 1 AND source = 's1'").count() == 5


def test_append_rejects_lossy_casts(spark, table):
    """The write-side cast contract is LOSSLESS-only: a string or a
    double fed to the long column must fail loudly (a blind cast
    would silently NULL / truncate — the ANSI store-assignment
    rule), while int->long keeps widening."""
    with pytest.raises(ValueError, match="unsafe cast"):
        txlog.append(
            spark,
            table,
            spark.range(3).select(
                F.col("id"), F.lit("oops").alias("bucket")
            ),
        )
    with pytest.raises(ValueError, match="unsafe cast"):
        txlog.append(
            spark,
            table,
            spark.range(3).select(
                F.col("id"), F.lit(1.5).alias("bucket")
            ),
        )
    # widening stays allowed
    v = txlog.append(
        spark,
        table,
        spark.range(8000, 8003).select(
            F.col("id"), F.lit(2).alias("bucket")
        ),
    )
    assert v >= 1
    assert txlog.read_table(spark, table).count() == 1003


def test_merge_probe_pruned_by_manifest_stats(spark, tmp_path):
    """On a key-clustered table the manifest's per-file min/max stats
    prune the merge probe: a narrow-key-range batch opens only the
    files whose range overlaps it (manifest 'probed' < total files),
    and the result is identical to an unpruned merge."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 4000).select(
            F.col("id"), F.lit(0).alias("bucket")
        ).repartition(4),
    )
    v = txlog.optimize(spark, root, target_file_bytes=4 << 10, cluster_by=("id",))
    n_files = len(txlog.snapshot_info(root, v)["files"])
    assert n_files >= 4
    upd = spark.range(100, 160).select(F.col("id"), F.lit(-1).alias("bucket"))
    v2 = txlog.merge(spark, root, upd, ("id",))
    m = json.load(open(txlog._manifest_path(root, v2)))
    assert m["probed"] < n_files, (m["probed"], n_files)
    assert m["rewrote"] <= m["probed"]
    got = txlog.read_table(spark, root)
    assert got.count() == 4000
    assert got.where("bucket = -1").count() == 60
    assert got.where("id >= 100 AND id < 160 AND bucket = 0").count() == 0
    # stats survive the merge commit for the NEXT prefilter
    snap = txlog.snapshot_info(root, v2)
    assert set(snap["stats"]) == set(snap["files"])


def test_restore_and_history(spark, table):
    """RESTORE rolls back as a NEW commit: contents equal the target
    snapshot, history is preserved (the rollback is itself undoable),
    the change feed across the restore is the row-level UNDO of the
    rolled-back commits, and vacuumed targets are refused."""
    txlog.append(
        spark,
        table,
        spark.range(1000, 1100).select(
            F.col("id"), F.lit(1).alias("bucket")
        ),
    )  # v1
    txlog.delete_where(spark, table, "bucket = 3")  # v2
    v3 = txlog.restore(spark, table, 0)
    assert v3 == 3
    got = txlog.read_table(spark, table)
    assert got.count() == 1000
    assert got.where("bucket = 3").count() == 100  # the delete undone
    # v2 (pre-restore) still readable: history preserved
    # (v1 = 1000 + 100 appended; v2 deleted the 100 bucket-3 originals)
    assert txlog.read_table(spark, table, version=2).count() == 1000
    # the feed across the restore is the undo: the appended 100 rows
    # deleted, the 100 deleted bucket-3 rows re-inserted
    cdf = txlog.read_changes(spark, table, 2, 3)
    by = {
        r["_change_type"]: r["n"]
        for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by["delete"] == 100 and by["insert"] == 100

    hist = txlog.history(spark, table).orderBy("version").collect()
    assert [r["op"] for r in hist] == ["create", "append", "delete", "restore"]
    assert json.loads(hist[3]["detail"])["restored_from"] == 0
    assert hist[2]["parent"] == 1

    # vacuum away everything older than current, then restore must fail
    txlog.vacuum(table, retain_versions=1)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        txlog.restore(spark, table, 2)


def test_lossless_cast_rule_decimal_boundaries(spark):
    """The decimal widening rule (dst gains BOTH scale and integer
    headroom) must be exactly the lossless set: for accepted (src,
    dst) pairs, casting src's extreme representable values through
    Spark preserves them bit-for-bit (no NULLs, no rounding); the
    rejected direction (losing scale or integer digits) stays
    rejected by the rule."""
    import decimal
    import random

    from pyspark.sql.types import DecimalType

    rng = random.Random(42)
    accepted = 0
    for _ in range(12):
        sp = rng.randint(2, 18)
        ss = rng.randint(0, sp - 1)
        src = DecimalType(sp, ss)
        dp = rng.randint(2, 38)
        ds = rng.randint(0, dp - 1)
        dst = DecimalType(dp, ds)
        ok = txlog._cast_is_lossless(src, dst)
        rule = ds >= ss and (dp - ds) >= (sp - ss)
        assert ok == rule, (src, dst)
        if not ok:
            continue
        accepted += 1
        # src's extremes: +/- (10^(p-s) - 10^-s)  and a mid value
        q = decimal.Decimal(1).scaleb(-ss)
        hi = decimal.Decimal(10) ** (sp - ss) - q
        vals = [hi, -hi, (hi / 3).quantize(q, rounding=decimal.ROUND_DOWN)]
        df = spark.createDataFrame([(v,) for v in vals], schema=f"v decimal({sp},{ss})")
        got = [r["v"] for r in df.select(F.col("v").cast(dst).alias("v")).collect()]
        assert all(g is not None for g in got), (src, dst, got)
        assert [decimal.Decimal(g) for g in got] == vals, (src, dst, got, vals)
    assert accepted >= 2  # the sample exercised the accept branch


def test_scan_table_prunes_files_by_manifest_stats(spark, tmp_path):
    """scan_table eliminates non-overlapping files at planning time
    (inputFiles() shrinks) and returns exactly the range's rows —
    identical to an unpruned read_table + filter."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 4000).select(
            F.col("id"), (F.col("id") % 7).alias("bucket")
        ).repartition(4),
    )
    txlog.optimize(spark, root, target_file_bytes=4 << 10, cluster_by=("id",))
    full = txlog.read_table(spark, root)
    n_files = len(full.inputFiles())
    assert n_files >= 4
    scanned = txlog.scan_table(spark, root, "id", 100, 160)
    assert len(scanned.inputFiles()) < n_files
    expect = full.where("id >= 100 AND id <= 160")
    assert scanned.exceptAll(expect).count() == 0
    assert expect.exceptAll(scanned).count() == 0
    assert scanned.count() == 61
    # pre-optimize snapshot (scattered, all files overlap): the
    # residual filter still yields exact results with zero pruning
    v0 = txlog.scan_table(spark, root, "id", 100, 160, version=0)
    assert v0.count() == 61
