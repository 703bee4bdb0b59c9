"""Round-15 optimization invariants: every behavior-adjacent change
this round pins its value identity here (the round-14 pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.operators import dedup
from map_reduce_rpc_spark.plans import textops


def test_txlog_cdf_single_pass_diff(spark):
    """read_changes' signed-count multiset diff == the exceptAll pair
    it replaced, on the hard cases: nulls, NaN, -0.0 vs 0.0, and
    duplicate multiplicities on both sides."""
    rows_a = [
        (1, "a", 1.0), (1, "a", 1.0), (2, "b", float("nan")),
        (3, None, 2.0), (4, "d", -0.0), (5, "e", None),
        (5, "e", None), (5, "e", None),
    ]
    rows_r = [
        (1, "a", 1.0), (2, "b", float("nan")), (4, "d", 0.0),
        (6, "f", 9.9), (5, "e", None),
    ]
    a = spark.createDataFrame(rows_a, "k long, s string, v double")
    r = spark.createDataFrame(rows_r, "k long, s string, v double")
    cols = ["k", "s", "v"]
    _w, _n = "__cdf_w__", "__cdf_n__"
    net = (
        a.select(*cols, F.lit(1).alias(_w))
        .unionByName(r.select(*cols, F.lit(-1).alias(_w)))
        .groupBy(*cols)
        .agg(F.sum(_w).alias(_n))
    )
    ins = net.where(F.col(_n) > 0).select(
        *cols, F.explode(F.sequence(F.lit(1), F.col(_n))).alias("__i__")
    ).drop("__i__")
    dels = net.where(F.col(_n) < 0).select(
        *cols, F.explode(F.sequence(F.lit(1), -F.col(_n))).alias("__i__")
    ).drop("__i__")

    def key(df):
        return sorted(map(str, df.collect()))

    assert key(ins) == key(a.exceptAll(r))
    assert key(dels) == key(r.exceptAll(a))


def test_bpe_apply_merge_expr_matches_column_form(spark):
    """The parsed-SQL _bpe_apply_merge equals the pre-round-15
    Column-operator construction on merge edge cases (adjacent
    occurrences, constituents, reversed pairs, short arrays)."""
    def old_form(tcol, ma, mb):
        n = F.size(tcol)
        mapped = F.transform(
            F.sequence(F.lit(0), n - F.lit(1)),
            lambda i: F.when(
                (F.get(tcol, i) == ma) & (F.get(tcol, i + 1) == mb),
                F.concat(ma, mb),
            )
            .when(
                (F.get(tcol, i) == mb) & (F.get(tcol, i - 1) == ma),
                F.lit(None).cast("string"),
            )
            .otherwise(F.get(tcol, i)),
        )
        return F.when(
            n >= 2, F.filter(mapped, lambda x: x.isNotNull())
        ).otherwise(tcol)

    toks = [
        ["a", "b"], ["a", "b", "a", "b"], ["a", "b", "b"],
        ["a", "a", "b"], ["b", "a", "b", "a"], ["x", "a", "b", "y"],
        ["b", "a"], ["a"], [],
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "i long, t array<string>"
    )
    got = df.select(
        "i",
        textops._bpe_apply_merge("t", "'a'", "'b'").alias("new"),
        old_form(F.col("t"), F.lit("a"), F.lit("b")).alias("old"),
    ).collect()
    for row in got:
        assert row["new"] == row["old"], row


def test_bpe_pair_explode_expr_matches_column_form(spark):
    """_BPE_PAIR_EXPLODE (SQL string) == the old F.struct/F.get
    transform on the same arrays."""
    toks = [["a", "b", "c"], ["x", "x"], ["p", "q", "p", "q"], ["lone", "z"]]
    df = spark.createDataFrame([(t,) for t in toks], "t array<string>")
    new = df.select(F.expr(textops._BPE_PAIR_EXPLODE).alias("p")).select(
        "p.a", "p.b"
    )
    old = df.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - F.lit(2)),
                lambda i: F.struct(
                    F.get("t", i).alias("a"), F.get("t", i + 1).alias("b")
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )
