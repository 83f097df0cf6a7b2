#!/usr/bin/env python
"""A/B: per-call IVF ANN vs the persisted cell-partitioned index.

The claim under test (`similarity.cosine_ann_ivf_indexed` +
`SignatureStore.ivf_index`): a probe against the PERSISTED index costs
O(cells probed) — centroid read (tiny) + query-side assignment + a
partition-pruned scan of nprobe cell directories — while the
self-contained `cosine_ann_ivf` pays the O(corpus) quantizer training
sample and the FULL-corpus cell assignment on every call. At 100 TB
that is the difference between a vector-search service and a batch job
per query.

Arms (same queries, same params; results cross-checked row-identical
at base scale):
  A: cosine_ann_ivf(corpus, queries)          — train + assign per call
  B: cosine_ann_ivf_indexed(store, queries)   — probe the artifact
     (+ the one-time index build, reported separately)

Corpus swept ×1/×8/×64 by appending synthetic unit vectors drawn from
a deterministic per-id hash (no two alike, same dim): arm A must grow
with the corpus (assignment matmul + candidate join over everything),
arm B's corpus-side read stays bounded by the probed cells' share.

Usage: python tools/ivf_ab.py  [SPARK_GRAFT_SF_DIR=...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("AB_ROUNDS", "3"))
PARAMS = dict(n_centroids=16, kmeans_iters=3, nprobe=4)
K = 5


def _unpersist_all(spark) -> None:
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()


def timed(spark, fn) -> float:
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    _unpersist_all(spark)
    return dt


def main() -> None:
    from pyspark.sql import functions as F

    from b3_analytics_engine_spark.operators.similarity import (
        cosine_ann_ivf,
        cosine_ann_ivf_indexed,
    )
    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.signature_store import SignatureStore
    from b3_analytics_engine_spark.tables import load_table

    spark = get_spark(
        app_name="ivf-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n_base = emb.count()
    first = emb.first()
    dim = len(first["embedding"])
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def synth(n, id_base, salt):
        """n distinct pseudo-random unit-ish vectors, fully engine-side:
        component j of id i = (xxhash64(salt,i,j) % 2001 - 1000)/1000."""
        cols = [
            (
                (
                    F.pmod(
                        F.xxhash64(F.lit(salt), F.col("id"), F.lit(j)),
                        F.lit(2001),
                    )
                    - 1000
                )
                / 1000.0
            ).cast("float")
            for j in range(dim)
        ]
        return spark.range(n).select(
            (F.col("id") + id_base).alias("vec_id"),
            F.array(*cols).alias("embedding"),
        )

    print(
        f"sf_dir={SF_DIR} base={n_base} dim={dim} queries=8 k={K} "
        f"params={PARAMS} rounds={N} (min-of-N, noop-forced)"
    )
    print(
        f"{'corpus':>8s} {'A: per-call IVF':>15s} {'B: indexed probe':>16s} "
        f"{'index build':>12s}"
    )

    rows = []
    for mult in (1, 8, 64):
        corpus = emb
        if mult > 1:
            corpus = emb.unionByName(
                synth((mult - 1) * n_base, 10_000_000, f"fill{mult}")
            )
        corpus = corpus.cache()
        n_total = corpus.count()
        root = tempfile.mkdtemp(prefix="ivf_ab_")
        try:
            store = SignatureStore(spark, root)

            def arm_a():
                return cosine_ann_ivf(
                    corpus, queries, k=K,
                    n_centroids=PARAMS["n_centroids"],
                    nprobe=PARAMS["nprobe"],
                    kmeans_iters=PARAMS["kmeans_iters"],
                )

            def arm_b():
                return cosine_ann_ivf_indexed(
                    store, "c", queries, k=K, **PARAMS
                )

            if mult == 1:
                arm_a().write.format("noop").mode("overwrite").save()
                _unpersist_all(spark)
            a_sec = min(timed(spark, arm_a) for _ in range(N))

            t0 = time.perf_counter()
            store.ivf_index(
                corpus, "c",
                n_centroids=PARAMS["n_centroids"],
                iters=PARAMS["kmeans_iters"],
            )
            build = time.perf_counter() - t0
            _unpersist_all(spark)

            if mult == 1:
                arm_b().write.format("noop").mode("overwrite").save()
                _unpersist_all(spark)
            b_sec = min(timed(spark, arm_b) for _ in range(N))
            rows.append((n_total, a_sec, b_sec, build))
            print(f"{n_total:8d} {a_sec:14.3f}s {b_sec:15.3f}s {build:11.3f}s")

            if mult == 1:
                got = sorted(tuple(r) for r in arm_b().collect())
                want = sorted(tuple(r) for r in arm_a().collect())
                assert got == want, "indexed probe != per-call IVF"
                print("results cross-checked row-identical at base scale")
                _unpersist_all(spark)
        finally:
            shutil.rmtree(root, ignore_errors=True)
            corpus.unpersist()
            _unpersist_all(spark)

    (c0, a0, b0, _), (c1, a1, b1, _) = rows[0], rows[-1]
    print(
        f"corpus x{c1 / c0:.0f}: arm A x{a1 / a0:.2f}, arm B x{b1 / b0:.2f} "
        "(per-call scales with corpus; indexed probe ~flat)"
    )


if __name__ == "__main__":
    main()
