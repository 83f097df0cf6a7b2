"""Data-quality audit operators + incremental partial-agg merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from b3_analytics_engine_spark.operators.aggregates import (
    merge_partial_aggregates,
    partial_aggregates,
)
from b3_analytics_engine_spark.operators.quality import (
    constraint_report,
    duplicate_key_count,
    orphan_count,
)
from b3_analytics_engine_spark.plans import physical_plan
from b3_analytics_engine_spark.tables import SMOKE_SF_DIR, load_table


def test_constraint_report_counts_nulls_as_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0), (None, 5.0)],
        "id bigint, v double",
    )
    rows = {
        r["check_name"]: r
        for r in constraint_report(
            df,
            "t",
            {
                "id_not_null": F.col("id").isNotNull(),
                "v_range_0_50": F.col("v").between(0, 50),
            },
        ).collect()
    }
    assert rows["id_not_null"]["n_violations"] == 1
    # v=None fails the range check (NULL predicate == violation), v=99 too
    assert rows["v_range_0_50"]["n_violations"] == 2
    assert rows["v_range_0_50"]["n_rows"] == 4
    assert rows["v_range_0_50"]["violation_rate"] == 0.5


def test_constraint_report_is_single_scan(spark):
    li = load_table(spark, SMOKE_SF_DIR, "lineitem")
    plan = physical_plan(
        constraint_report(
            li,
            "lineitem",
            {
                "qty": F.col("l_quantity").between(1, 50),
                "tax": F.col("l_tax") <= 0.05,
                "rf": F.col("l_returnflag").isin("A", "N", "R"),
            },
        )
    )
    # all rules fold into one aggregate over one scan (the formatted
    # plan prints each scan node once in the tree and once in the
    # detail section — count the detail headers)
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_duplicate_and_orphan_reports(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (9, "c")], "k bigint, x string"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k bigint")
    dup = duplicate_key_count(child, "child", ["k", "x"], "pk").collect()[0]
    assert dup["n_violations"] == 1 and dup["n_rows"] == 4
    orph = orphan_count(child, parent, "k", "k", "child", "fk").collect()[0]
    assert orph["n_violations"] == 1  # k=9 twice? no — one row with k=9
    assert orph["n_rows"] == 4


def test_partial_merge_equals_direct(spark):
    ev = load_table(spark, SMOKE_SF_DIR, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value", "ts"
    )
    # three-way split on arbitrary boundaries, incl. mid-day cuts
    splits = [
        ev.filter(F.col("ts") < "2024-01-08 06:00:00"),
        ev.filter(
            (F.col("ts") >= "2024-01-08 06:00:00")
            & (F.col("ts") < "2024-01-21 18:30:00")
        ),
        ev.filter(F.col("ts") >= "2024-01-21 18:30:00"),
    ]
    merged = merge_partial_aggregates(
        [partial_aggregates(s.drop("ts"), ["user_id", "day"], "value") for s in splits],
        ["user_id", "day"],
    )
    direct = partial_aggregates(ev.drop("ts"), ["user_id", "day"], "value")

    def canon(df):
        return sorted(
            (r["user_id"], r["day"], r["cnt"], round(r["s"], 6), r["mn"], r["mx"])
            for r in df.collect()
        )

    assert canon(merged) == canon(direct)


def test_snapshot_diff_classifies_all_change_types(spark):
    from b3_analytics_engine_spark.operators.rowops import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "k bigint, v double, s string",
    )
    new = spark.createDataFrame(
        [(2, 20.0, "b"), (3, 99.0, "c"), (4, 40.0, "d")],
        "k bigint, v double, s string",
    )
    rows = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["v", "s"]).collect()
    }
    assert rows[1]["change_type"] == "removed" and rows[1]["new_v"] is None
    assert 2 not in rows  # unchanged filtered out
    assert rows[3]["change_type"] == "changed" and rows[3]["old_v"] == 30.0
    assert rows[4]["change_type"] == "added" and rows[4]["old_v"] is None
    full = snapshot_diff(old, new, ["k"], ["v", "s"], include_unchanged=True)
    assert full.count() == 4


def test_quarantine_split_partitions_and_annotates(spark):
    from pyspark.sql import Row

    from b3_analytics_engine_spark.operators.quality import quarantine_split

    df = spark.createDataFrame(
        [
            Row(k=1, qty=10, flag="A"),
            Row(k=2, qty=99, flag="A"),      # qty out of range
            Row(k=3, qty=5, flag="X"),       # bad enum
            Row(k=4, qty=None, flag="X"),    # NULL qty fails range + bad enum
        ]
    )
    checks = {
        "qty_range": F.col("qty").between(1, 50),
        "flag_enum": F.col("flag").isin("A", "N", "R"),
    }
    clean, bad = quarantine_split(df, checks)
    assert {r["k"] for r in clean.collect()} == {1}
    got = {r["k"]: r["failed_rules"] for r in bad.collect()}
    assert got == {2: "qty_range", 3: "flag_enum", 4: "qty_range,flag_enum"}
    # split is a partition: no row lost or duplicated
    assert clean.count() + bad.count() == df.count()
