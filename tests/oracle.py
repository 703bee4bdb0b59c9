"""Local replica of the driver's Spark-vs-DuckDB compare: row count,
column names, and order-insensitive value comparison. Catch mismatches
before the driver does."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # canonical row order: sort by every column's string form
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def assert_matches(spark_df, duck_rel, float_tol: float = 1e-9) -> None:
    left = _normalize(spark_df.toPandas())
    right = _normalize(duck_rel.fetchdf())
    assert list(left.columns) == list(right.columns), (
        f"column mismatch: spark={list(left.columns)} duck={list(right.columns)}"
    )
    assert len(left) == len(right), f"row count: spark={len(left)} duck={len(right)}"
    for col in left.columns:
        ls, rs = left[col], right[col]
        # a dtype-KIND split (one side integer, the other float) is a
        # driver failure even when values are numerically equal: the
        # driver hashes astype(str), so '1815764' != '1815764.0'.
        # Round-8 find: DuckDB sums BIGINT into HUGEINT, which lands
        # as float64 in pandas — cast the oracle's aggregate instead.
        li, ri = (
            pd.api.types.is_integer_dtype(ls),
            pd.api.types.is_integer_dtype(rs),
        )
        lf, rf = (
            pd.api.types.is_float_dtype(ls),
            pd.api.types.is_float_dtype(rs),
        )
        assert not ((li and rf) or (lf and ri)), (
            f"{col}: dtype kind split (spark={ls.dtype}, duck={rs.dtype})"
            " — the driver's stringified hash WILL reject this; CAST the"
            " oracle column (HUGEINT sums need CAST(... AS BIGINT))"
        )
        if pd.api.types.is_float_dtype(ls) or pd.api.types.is_float_dtype(rs):
            for i, (a, b) in enumerate(zip(ls, rs)):
                if pd.isna(a) and pd.isna(b):
                    continue
                assert math.isclose(float(a), float(b), rel_tol=float_tol, abs_tol=float_tol), (
                    f"{col}[{i}]: spark={a!r} duck={b!r}"
                )
        else:
            la, ra = ls.astype(str).tolist(), rs.astype(str).tolist()
            if la != ra:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(la, ra)) if a != b][:5]
                raise AssertionError(f"{col} differs, first diffs: {diffs}")
