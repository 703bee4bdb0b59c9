"""SQL-text DML (sources/sql_dml.py): DELETE FROM / UPDATE / MERGE
INTO strings routed to the library verbs. The parser is pure, so the
grammar is pinned without Spark; the end-to-end tests prove each
statement produces EXACTLY the library verb's commit (same op, same
rows) — the dispatch layer adds no semantics of its own."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import sql_dml, txlog

# ---------------------------------------------------------------- parser


def test_parse_delete():
    d = sql_dml.parse(
        "DELETE FROM `/tmp/t` WHERE bucket = 3 AND name = 'x WHERE y';"
    )
    assert d == {
        "op": "delete",
        "path": "/tmp/t",
        "predicate": "bucket = 3 AND name = 'x WHERE y'",
    }


def test_parse_update_multi_assign():
    d = sql_dml.parse(
        "update `/t` set a = a + 1, b = concat(b, ', suffix'), "
        "`c` = CASE WHEN a = 1 THEN 2 ELSE 3 END where a < 10"
    )
    assert d["op"] == "update" and d["path"] == "/t"
    assert d["set"] == {
        "a": "a + 1",
        "b": "concat(b, ', suffix')",
        "c": "CASE WHEN a = 1 THEN 2 ELSE 3 END",
    }
    assert d["predicate"] == "a < 10"


def test_parse_merge_key_list_and_equality_chain():
    d = sql_dml.parse("MERGE INTO `/t` USING updates_view ON id")
    assert d == {
        "op": "merge",
        "path": "/t",
        "source": "updates_view",
        "keys": ["id"],
    }
    d2 = sql_dml.parse(
        "MERGE INTO `/t` USING (SELECT * FROM v WHERE ok) "
        "ON t.id = s.id AND t.day = s.day"
    )
    assert d2["keys"] == ["id", "day"]
    assert d2["source"] == "(SELECT * FROM v WHERE ok)"


def test_parse_rejections():
    with pytest.raises(ValueError, match="backtick"):
        sql_dml.parse("DELETE FROM /tmp/t WHERE x = 1")
    with pytest.raises(ValueError, match="WHERE"):
        sql_dml.parse("DELETE FROM `/t`")  # blanket delete must be spelled
    with pytest.raises(ValueError, match="WHERE"):
        sql_dml.parse("UPDATE `/t` SET a = 1")
    with pytest.raises(ValueError, match="assigned twice"):
        sql_dml.parse("UPDATE `/t` SET a = 1, a = 2 WHERE true")
    with pytest.raises(ValueError, match="SAME column"):
        sql_dml.parse("MERGE INTO `/t` USING v ON t.id = s.other")
    with pytest.raises(ValueError, match="unsupported statement"):
        sql_dml.parse("SELECT * FROM t")
    with pytest.raises(ValueError, match="unterminated"):
        sql_dml.parse("DELETE FROM `/t` WHERE name = 'oops")
    with pytest.raises(ValueError, match="unbalanced"):
        sql_dml.parse("UPDATE `/t` SET a = f(1 WHERE true")


def test_parse_keywords_inside_quotes_do_not_split():
    # a WHERE/SET/comma INSIDE a string literal or subquery must not
    # confuse the clause scanner
    d = sql_dml.parse(
        "UPDATE `/t` SET note = 'SET a = 1 WHERE b, c' "
        "WHERE id IN (SELECT id FROM v WHERE grp = ',')"
    )
    assert d["set"] == {"note": "'SET a = 1 WHERE b, c'"}
    assert d["predicate"] == "id IN (SELECT id FROM v WHERE grp = ',')"


# ------------------------------------------------------------ end-to-end


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 100).select(
            "id", (F.col("id") % 10).alias("bucket")
        ),
    )
    return root


def test_sql_delete_matches_library(spark, table):
    v = sql_dml.sql(spark, f"DELETE FROM `{table}` WHERE bucket = 3")
    assert v == 1
    assert txlog._read_manifest(table, 1)["op"] == "delete"
    got = txlog.read_table(spark, table)
    assert got.count() == 90 and got.where("bucket = 3").count() == 0


def test_sql_update_dv_matches_library(spark, table):
    v = sql_dml.sql(
        spark,
        f"UPDATE `{table}` SET bucket = bucket + 100 WHERE id < 10",
        mode="dv",
    )
    assert v == 1
    m = txlog._read_manifest(table, 1)
    assert m["op"] == "update" and m["dv_rows"] == 10
    assert (
        txlog.read_table(spark, table).where("bucket >= 100").count() == 10
    )


def test_sql_merge_with_subquery_source(spark, table):
    spark.range(95, 105).select(
        "id", F.lit(-1).alias("bucket")
    ).createOrReplaceTempView("dml_updates")
    v = sql_dml.sql(
        spark,
        f"MERGE INTO `{table}` USING "
        "(SELECT * FROM dml_updates WHERE id < 103) ON t.id = s.id",
    )
    assert v == 1
    got = txlog.read_table(spark, table)
    assert got.count() == 103  # 100 originals, 5 replaced, 3 inserted
    assert got.where("bucket = -1").count() == 8


def test_sql_merge_idempotence_passthrough(spark, table):
    spark.range(0, 5).select(
        "id", F.lit(-2).alias("bucket")
    ).createOrReplaceTempView("dml_batch")
    stmt = f"MERGE INTO `{table}` USING dml_batch ON id"
    v1 = sql_dml.sql(spark, stmt, app_id="dml", txn_version=1)
    # redelivery: same (app_id, txn_version) must commit NOTHING
    v2 = sql_dml.sql(spark, stmt, app_id="dml", txn_version=1)
    assert v1 == 1 and v2 == 1
    assert txlog.current_version(table) == 1


# -------------------------------------------------- property-based grammar

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    # bare identifiers must not collide with the grammar's keywords —
    # standard SQL: a keyword-named column needs backticks (`where`),
    # which the scanner already treats as quoting
    _KEYWORDS = {"where", "set", "and", "on", "using", "from"}
    _ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True).filter(
        lambda s: s not in _KEYWORDS
    )
    # string literals may contain ANY of the grammar's separator
    # characters — the scanner must never split inside them (doubled
    # '' is the SQL escape for a quote)
    _str_lit = st.text(
        alphabet="ab,() WHERE SET=AND'",
        max_size=12,
    ).map(lambda s: "'" + s.replace("'", "''") + "'")

    @st.composite
    def _expr(draw, depth=2):
        atom = draw(
            st.one_of(
                _ident,
                st.integers(-999, 999).map(str),
                _str_lit,
            )
        )
        if depth > 0 and draw(st.booleans()):
            inner = draw(
                st.lists(_expr(depth=depth - 1), min_size=1, max_size=3)
            )
            return f"{draw(_ident)}({', '.join(inner)})"
        return atom

    @given(
        assigns=st.dictionaries(_ident, _expr(), min_size=1, max_size=4),
        pred=_expr(),
    )
    @settings(max_examples=200, deadline=None)
    def test_update_roundtrips_arbitrary_expressions(assigns, pred):
        """parse() must recover EXACTLY the assignments and predicate
        that went in, for any expressions built from identifiers,
        numbers, nested calls, and string literals containing the
        grammar's own separators (commas, parens, WHERE/SET/AND,
        quotes). One wrong split silently rewrites someone's UPDATE."""
        stmt = (
            "UPDATE `/t` SET "
            + ", ".join(f"{c} = {e}" for c, e in assigns.items())
            + f" WHERE {pred} = 1"
        )
        d = sql_dml.parse(stmt)
        assert d["op"] == "update"
        assert d["set"] == assigns
        assert d["predicate"] == f"{pred} = 1"

    @given(pred=_expr())
    @settings(max_examples=100, deadline=None)
    def test_delete_roundtrips_arbitrary_predicates(pred):
        d = sql_dml.parse(f"DELETE FROM `/t` WHERE f({pred}, {pred})")
        assert d["predicate"] == f"f({pred}, {pred})"


# ------------------------------------------------- maintenance verbs


def test_parse_maintenance_verbs():
    assert sql_dml.parse("VACUUM `/t`") == {"op": "vacuum", "path": "/t"}
    assert sql_dml.parse("vacuum `/t` retain 2.5 hours dry run") == {
        "op": "vacuum",
        "path": "/t",
        "retain_hours": 2.5,
        "dry_run": True,
    }
    assert sql_dml.parse("OPTIMIZE `/t`") == {
        "op": "optimize",
        "path": "/t",
    }
    d = sql_dml.parse(
        "OPTIMIZE `/t` WHERE p = 3 AND q = 'x' ZORDER BY (a, `b`)"
    )
    assert d == {
        "op": "optimize",
        "path": "/t",
        "partitions": {"p": 3, "q": "x"},
        "zorder_by": ("a", "b"),
    }
    assert sql_dml.parse("optimize `/t` zorder by a")["zorder_by"] == ("a",)
    assert sql_dml.parse("RESTORE TABLE `/t` TO VERSION AS OF 4") == {
        "op": "restore",
        "path": "/t",
        "version": 4,
    }
    assert sql_dml.parse(
        "RESTORE `/t` TO TIMESTAMP AS OF '2026-01-01T00:00:00'"
    ) == {"op": "restore", "path": "/t", "timestamp": "2026-01-01T00:00:00"}
    assert sql_dml.parse("DESCRIBE HISTORY `/t`") == {
        "op": "history",
        "path": "/t",
    }
    for bad in [
        "VACUUM `/t` RETAIN HOURS",
        "VACUUM `/t` FULL",
        "OPTIMIZE `/t` WHERE p > 3",          # not a literal equality
        "OPTIMIZE `/t` ZORDER a",             # missing BY
        "RESTORE `/t` TO VERSION AS OF x",
        "RESTORE `/t`",
        "DESCRIBE HISTORY `/t` extra",
    ]:
        with pytest.raises(ValueError):
            sql_dml.parse(bad)


def test_sql_maintenance_end_to_end(spark, table):
    """Each maintenance statement produces EXACTLY the library verb's
    effect: OPTIMIZE ZORDER commits a compaction, DESCRIBE HISTORY
    returns the op rows, RESTORE rolls back as a new commit, VACUUM
    DRY RUN lists without deleting and the real VACUUM reclaims."""
    import os

    sql_dml.sql(spark, f"DELETE FROM `{table}` WHERE bucket = 9")
    v = sql_dml.sql(spark, f"OPTIMIZE `{table}` ZORDER BY (id)")
    assert v == 2
    assert txlog._read_manifest(table, 2)["op"] == "optimize"
    hist = sql_dml.sql(spark, f"DESCRIBE HISTORY `{table}`")
    assert [r["op"] for r in hist.collect()] == [
        "create",
        "delete",
        "optimize",
    ]
    assert sql_dml.sql(
        spark, f"RESTORE TABLE `{table}` TO VERSION AS OF 1"
    ) == 3
    assert txlog.read_table(spark, table).count() == 90
    dry = sql_dml.sql(spark, f"VACUUM `{table}` DRY RUN")
    # paths are table-root-relative (the on-disk manifest form)
    assert dry and all(
        os.path.exists(os.path.join(table, p)) for p in dry
    )
    gone = sql_dml.sql(spark, f"VACUUM `{table}`")
    assert set(gone) == set(dry)
    assert not any(os.path.exists(os.path.join(table, p)) for p in gone)
    # the restored snapshot still reads after the vacuum
    assert txlog.read_table(spark, table).count() == 90


def test_sql_restore_timestamp_and_partition_scoped_optimize(
    spark, tmp_path
):
    import time

    root = str(tmp_path / "pt")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 40).select(
            "id", (F.col("id") % 2).alias("p")
        ),
        partition_by=("p",),
    )
    t_after_create = time.time()
    time.sleep(1.1)
    sql_dml.sql(spark, f"DELETE FROM `{root}` WHERE id < 10")
    # partition-scoped OPTIMIZE touches only p=1's dirs
    v = sql_dml.sql(spark, f"OPTIMIZE `{root}` WHERE p = 1")
    m = txlog._read_manifest(root, v)
    assert m["op"] == "optimize"
    # timestamp restore resolves to the newest version at that time
    sql_dml.sql(
        spark,
        f"RESTORE `{root}` TO TIMESTAMP AS OF {t_after_create}",
    )
    assert txlog.read_table(spark, root).count() == 40


def test_parse_and_run_clone(spark, table, tmp_path):
    assert sql_dml.parse("CLONE `/a` TO `/b`") == {
        "op": "clone",
        "path": "/a",
        "dst": "/b",
    }
    assert sql_dml.parse("clone `/a` to `/b` version as of 2") == {
        "op": "clone",
        "path": "/a",
        "dst": "/b",
        "version": 2,
    }
    with pytest.raises(ValueError):
        sql_dml.parse("CLONE `/a` `/b`")
    with pytest.raises(ValueError):
        sql_dml.parse("CLONE `/a` TO `/b` AT 2")
    # end to end: the hard-link clone of the pre-delete snapshot
    sql_dml.sql(spark, f"DELETE FROM `{table}` WHERE bucket = 0")
    dst = str(tmp_path / "cl")
    sql_dml.sql(
        spark, f"CLONE `{table}` TO `{dst}` VERSION AS OF 0"
    )
    assert txlog.read_table(spark, dst).count() == 100  # pre-delete
    assert txlog.read_table(spark, table).count() == 90
    # the clone is its own table: mutating it leaves the source alone
    sql_dml.sql(spark, f"DELETE FROM `{dst}` WHERE bucket = 1")
    assert txlog.read_table(spark, dst).count() == 90
    assert txlog.read_table(spark, table).count() == 90
