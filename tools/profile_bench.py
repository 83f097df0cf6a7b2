#!/usr/bin/env python
"""Per-query cost breakdown for the bench headline set (r16 measure-first
pass, spark_optimization_guide §1).

For each headline query, reports:

- build_s  — wall time to CONSTRUCT the DataFrame (analysis on the
  driver; Catalyst optimization runs at action time, but plan-tree
  construction + analysis cost lives here),
- first_s  — the warmup noop write (includes codegen compile, AQE
  re-planning one-offs AND the compute that populates materialize()'d
  caches — bench.py's warmup does exactly this),
- steady_s — min of N noop writes of a FRESHLY REBUILT plan WITHOUT
  unpersisting between runs (bench.py's exact timed methodology:
  persisted intermediates from the warmup stay cached, CacheManager
  matches the rebuilt plan by canonicalized-plan equality),
- njobs    — Spark jobs launched by one steady run (AQE stage
  materializations show up here; a high count at tiny SF is
  driver-latency, not data work).

Usage: python tools/profile_bench.py [query ...]   (default: whole set)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("PROFILE_ROUNDS", "2"))


def _unpersist_all(spark) -> None:
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()


def main() -> None:
    from bench import HEADLINE
    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.queries import spark_queries
    from b3_analytics_engine_spark.queries.llmdata import (
        corpus_dedup_pipeline,
        cosine_ann_ivf_raw,
        cosine_ann_lsh_raw,
        media_curation_pipeline,
    )

    spark = get_spark(
        app_name="profile-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    qs = spark_queries()
    qs["cosine_ann_lsh_raw"] = cosine_ann_lsh_raw
    qs["cosine_ann_ivf_raw"] = cosine_ann_ivf_raw
    qs["corpus_dedup_pipeline"] = corpus_dedup_pipeline
    qs["media_curation_pipeline"] = media_curation_pipeline

    names = sys.argv[1:] or HEADLINE
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        first = time.perf_counter() - t0
        steady = float("inf")
        njobs = -1
        for i in range(N):
            sc.setJobGroup(f"prof-{name}-{i}", name)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            njobs = len(tracker.getJobIdsForGroup(f"prof-{name}-{i}"))
            sc.setJobGroup("cleanup", "cleanup")
            steady = min(steady, dt)
        _unpersist_all(spark)
        out[name] = {
            "build": round(build, 3),
            "first": round(first, 3),
            "steady": round(steady, 3),
            "njobs": njobs,
        }
        print(
            f"{name:28s} build={build:6.3f} first={first:6.3f} "
            f"steady={steady:6.3f} njobs={njobs}",
            flush=True,
        )
    total = round(sum(v["steady"] for v in out.values()), 3)
    print(json.dumps({"total_steady": total, "queries": out}))


if __name__ == "__main__":
    main()
