#!/usr/bin/env python
"""Capture .explain("formatted") output per query into plans/r16/.

Usage: python tools/capture_plans.py <suffix> <query> [query ...]

Writes plans/r16/<query>_<suffix>.txt for each named query (registered
queries plus the bench-only raw callables).  The judge reads these to
check plan claims in OPTIMIZATION_r16.md against the code.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r16")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)

    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.queries import spark_queries
    from b3_analytics_engine_spark.queries.llmdata import (
        corpus_dedup_pipeline,
        cosine_ann_ivf_raw,
        cosine_ann_lsh_raw,
        media_curation_pipeline,
    )

    spark = get_spark(
        app_name="capture-plans",
        master="local[8]",
        shuffle_partitions=8,
    )
    qs = spark_queries()
    qs["cosine_ann_lsh_raw"] = cosine_ann_lsh_raw
    qs["cosine_ann_ivf_raw"] = cosine_ann_ivf_raw
    qs["corpus_dedup_pipeline"] = corpus_dedup_pipeline
    qs["media_curation_pipeline"] = media_curation_pipeline

    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
