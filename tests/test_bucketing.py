"""Bucketed co-located join: the fact⋈fact shuffle eliminator.

Writes orders and lineitem bucketed on the join key and asserts the
join plan has NO shuffle (Exchange) on either side — the property
that lets a 100 TB fact⋈fact join run without moving data. Also
asserts result equality with the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from b3_analytics_engine_spark.plans import physical_plan
from b3_analytics_engine_spark.sources.files import table_exists, write_bucketed_table
from b3_analytics_engine_spark.tables import SMOKE_SF_DIR, load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/b3_spark_warehouse/{t}", ignore_errors=True)
    o = load_table(spark, SMOKE_SF_DIR, "orders")
    li = load_table(spark, SMOKE_SF_DIR, "lineitem")
    write_bucketed_table(o, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed_table(li, "b_lineitem", "l_orderkey", 8, sort_col="l_orderkey")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_catalog_probe(spark, bucketed_tables):
    assert table_exists(spark, "b_orders")
    assert not table_exists(spark, "no_such_table")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    import re

    # force the sort-merge path (tiny test tables would otherwise be
    # broadcast, which hides the property under test: at 100 TB
    # neither side broadcasts and co-location is what saves the day)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        joined = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = physical_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # shuffle Exchanges before the join: none — buckets align.
    # (the post-join aggregation Exchange on o_orderstatus remains;
    # BroadcastExchange doesn't count as a shuffle)
    join_section = plan.split("HashAggregate")[0]
    shuffles = re.findall(r"\(\d+\) Exchange\b", join_section)
    assert not shuffles, f"join still shuffles:\n{join_section}"


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    o = load_table(spark, SMOKE_SF_DIR, "orders")
    li = load_table(spark, SMOKE_SF_DIR, "lineitem")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucketed = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed.collect())
    )
