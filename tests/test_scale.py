"""Scale-technique checks: bucketed joins plan without exchanges;
salted ops match their unsalted equivalents exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_rpc_spark.operators import scale
from map_reduce_rpc_spark.tables import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    scale.write_bucketed_table(
        orders, "t_orders_b", "o_orderkey", 8, str(tmp_path / "ob")
    )
    scale.write_bucketed_table(
        lineitem, "t_lineitem_b", "o_orderkey", 8, str(tmp_path / "lb")
    )
    # force sort-merge (hint on a join input) so a shuffle would be visible
    joined = (
        spark.table("t_orders_b")
        .hint("merge")
        .join(spark.table("t_lineitem_b"), "o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    # and the join is still correct
    expect = orders.join(lineitem, "o_orderkey").count()
    assert joined.count() == expect


def test_salted_distinct_count_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = {
        r.l_returnflag: r.n_distinct
        for r in scale.salted_distinct_count(li, "l_returnflag", "l_partkey").collect()
    }
    direct = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert salted == direct


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum("l_quantity").alias("q"))
    )
    salted = (
        scale.salted_join(
            li.withColumnRenamed("l_partkey", "p_partkey"),
            part,
            on="p_partkey",
            fact_salt_src="l_orderkey",
        )
        .groupBy("p_brand")
        .agg(F.sum("l_quantity").alias("q"))
    )
    ps = {r.p_brand: r.q for r in plain.collect()}
    ss = {r.p_brand: r.q for r in salted.collect()}
    assert ps == ss
