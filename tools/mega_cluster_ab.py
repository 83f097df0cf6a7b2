#!/usr/bin/env python
"""Adversarial-scale A/B for the hot-bucket caps (r9 verdict task #2).

The caps (`pipelines.DEFAULT_MAX_*`, on by default at the pipeline
layer) exist for one failure mode: a planted mega-cluster — thousands
of near-identical documents from one boilerplate template — lands in
the SAME band/chunk/RHP bucket, and a bucket of B rows emits B(B−1)/2
self-join candidates inside one task. This script measures that
empirically at sf0.1 corpus volume, for all three banding families:

  - uncapped arm at growing cluster sizes → pair count and wall time
    grow quadratically;
  - capped arm (pipeline defaults: 1024 band/chunk, 4096 RHP) at the
    same and LARGER sizes → flat, because buckets wider than the cap
    are dropped before the self-join.

Planted docs are near-identical, NOT byte-identical (each carries one
unique trailing token, Jaccard ≈ 0.86 to the template), so the exact
dedup tier would NOT collapse them — this is precisely the residue
the caps are the last line of defense against.

Usage: python tools/mega_cluster_ab.py   [SPARK_GRAFT_SF_DIR=...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UNCAPPED_SIZES = [500, 1000, 2000]
CAPPED_SIZES = [500, 1000, 2000, 4000, 8000]
PLANT_BASE = 10_000_000  # planted ids sit far above fixture ids

TEMPLATE = (
    "breaking market update the composite index moved sharply today as "
    "traders digested fresh inflation figures and central bank guidance "
    "while energy names led the advance and small caps lagged behind "
    "analysts said the pattern mirrors previous cycles of rate repricing"
)


def _unpersist_all(spark) -> None:
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()


def planted_docs(spark, base_docs, b: int):
    from pyspark.sql import functions as F

    plant = spark.range(b).select(
        (F.col("id") + PLANT_BASE).alias("doc_id"),
        F.concat(F.lit(TEMPLATE + " variant"), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    return base_docs.select("doc_id", "text").unionByName(plant)


def planted_embs(spark, base_embs, b: int):
    from pyspark.sql import functions as F

    # near-identical vectors: e0 plus a tiny per-row epsilon on dim 1
    # (cos > 0.9999; same RHP cell in every hash table)
    plant = spark.range(b).select(
        (F.col("id") + PLANT_BASE).alias("vec_id"),
        F.array(
            F.lit(1.0),
            (F.col("id") % 97).cast("double") * 1e-9,
            *[F.lit(0.0)] * 62,
        ).alias("embedding"),
    )
    return base_embs.select("vec_id", "embedding").unionByName(plant)


def timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    from b3_analytics_engine_spark import pipelines as P
    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.tables import load_table

    spark = get_spark(
        app_name="mega-cluster-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    docs = load_table(spark, SF_DIR, "documents")
    embs = load_table(spark, SF_DIR, "embeddings")
    docs.count()
    embs.count()

    fams = {
        "minhash": lambda d, cap: P.neardup_pairs(
            d, "minhash", threshold=0.5, max_bucket=cap
        ),
        "simhash": lambda d, cap: P.neardup_pairs(
            d, "simhash", max_hamming=3, max_bucket=cap
        ),
        "embedding": lambda d, cap: P.neardup_pairs(
            d, "embedding", id_col="vec_id", threshold=0.99, max_bucket=cap
        ),
    }
    print(f"sf_dir={SF_DIR} caps: band/chunk={P.DEFAULT_MAX_BAND_BUCKET}/"
          f"{P.DEFAULT_MAX_CHUNK_BUCKET} rhp={P.DEFAULT_MAX_RHP_BUCKET}")
    print(f"{'family':10s} {'arm':9s} {'B':>6s} {'pairs':>12s} {'sec':>8s}")
    for fam, fn in fams.items():
        build = planted_embs if fam == "embedding" else planted_docs
        base = embs if fam == "embedding" else docs
        for arm, cap, sizes in (
            ("uncapped", None, UNCAPPED_SIZES),
            ("capped", -1, CAPPED_SIZES),
        ):
            for b in sizes:
                d = build(spark, base, b)
                sec, n = timed_count(fn(d, cap))
                _unpersist_all(spark)
                print(
                    f"{fam:10s} {arm:9s} {b:6d} {n:12d} {sec:8.2f}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
