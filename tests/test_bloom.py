"""Bloom prefilter invariants (operators/bloom.py).

The oracle-parity suite already proves `decontaminate_bloom` returns
exactly the un-prefiltered result; these tests pin the *mechanism*:
no false negatives ever, a usefully small candidate set, and the
bounded size of the broadcast bitset.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from b3_analytics_engine_spark.operators.bloom import (
    M_BITS_DEFAULT,
    bloom_build,
    might_contain,
)


def _members_and_probe(spark, n_members=4000, n_probe=20000):
    members = spark.range(0, n_members).select(
        (F.col("id") * 7919).alias("k")  # non-contiguous keys
    )
    probe = spark.range(0, n_probe).select(F.col("id").alias("k"))
    return members, probe


def test_no_false_negatives(spark):
    members, _ = _members_and_probe(spark)
    bloom = bloom_build(members, "k")
    hits = (
        members.crossJoin(F.broadcast(bloom))
        .where(might_contain("bloom", "k"))
        .count()
    )
    assert hits == members.count()  # every member passes the probe


def test_false_positive_rate_bounded(spark):
    members, probe = _members_and_probe(spark)
    bloom = bloom_build(members, "k")
    true_members = probe.join(members, "k", "left_semi").count()
    cand = (
        probe.crossJoin(F.broadcast(bloom))
        .where(might_contain("bloom", "k"))
        .count()
    )
    n_non_members = probe.count() - true_members
    fp_rate = (cand - true_members) / n_non_members
    # theoretical rate for 4k keys / 2^17 bits / k=3 is ~0.1%; allow
    # a wide margin so the test pins the order of magnitude, not the
    # exact hash behavior.
    assert 0 <= fp_rate < 0.02


def test_bitset_is_bounded_and_sparse(spark):
    members, _ = _members_and_probe(spark)
    row = bloom_build(members, "k").collect()
    assert len(row) == 1
    bloom_map = row[0]["bloom"]
    assert len(bloom_map) <= M_BITS_DEFAULT // 64
    assert all(0 <= s < M_BITS_DEFAULT // 64 for s in bloom_map)


def test_prefilter_result_equals_exact_semi_join(spark):
    members, probe = _members_and_probe(spark)
    bloom = bloom_build(members, "k")
    via_bloom = (
        probe.crossJoin(F.broadcast(bloom))
        .where(might_contain("bloom", "k"))
        .drop("bloom")
        .join(members, "k", "left_semi")
    )
    exact = probe.join(members, "k", "left_semi")
    assert sorted(r["k"] for r in via_bloom.collect()) == sorted(
        r["k"] for r in exact.collect()
    )


def test_probe_plan_has_no_python_and_no_shuffle(spark):
    """The probe must stay a scan-stage filter: broadcast of the
    1-row bloom, no Exchange introduced on the probe side, no
    Python evaluation anywhere."""
    members, probe = _members_and_probe(spark)
    bloom = bloom_build(members, "k")
    cand = probe.crossJoin(F.broadcast(bloom)).where(
        might_contain("bloom", "k")
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly ONE hash exchange in the whole plan — the bloom build's
    # per-slot bit_or (constant-bounded). The probe side feeds the
    # BroadcastNestedLoopJoin directly from its scan, shuffle-free.
    assert plan.count("Exchange hashpartitioning") == 1
