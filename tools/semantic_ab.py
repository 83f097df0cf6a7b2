#!/usr/bin/env python
"""A/B: restatement semantic dedup vs the incremental embedding tier.

The claim under test (`pipelines.incremental_semantic_dedup` +
`SignatureStore.ivf_index`): deduplicating a DAILY BATCH of vectors
against the corpus costs O(batch × occupied-cell mass) when the corpus
side is the persisted cell-partitioned inverted file — the batch
assigns against the frozen quantizer and the corpus probe reads only
the batch's occupied cells via partition pruning — while the
restatement (`similarity.semantic_dedup` over corpus ∪ batch, cut to
the batch) re-clusters and re-scans EVERYTHING every day. At 100 TB
that is the difference between a nightly increment and a nightly
full-corpus job.

Arms (same batch, same threshold; results cross-checked identical on
the planted duplicates at base scale):
  A: semantic_dedup(corpus ∪ batch)           — re-cluster per day
  B: incremental_semantic_dedup(batch, store) — probe the artifact
     (+ the one-time index build, reported separately)

Corpus swept ×1/×8/×64 with synthetic distinct unit-ish vectors (same
deterministic per-id hash as tools/ivf_ab.py), and — per
semantic_dedup's own scaling contract — the cluster count sweeps WITH
the corpus (16/128/1024: SemDeDup uses 50k clusters at LAION scale;
a fixed cell count over a growing corpus makes the per-cell pair join
quadratic in corpus size for BOTH arms, which measures a
misconfiguration, not the architecture). The batch is 100 new vectors
+ 20 exact copies of corpus vectors (which MUST drop in both arms —
checked).

Usage: python tools/semantic_ab.py  [SPARK_GRAFT_SF_DIR=...]
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
ITERS = 3
THRESHOLD = 0.999


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

    from b3_analytics_engine_spark import pipelines as P
    from b3_analytics_engine_spark.operators.similarity import semantic_dedup
    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.signature_store import SignatureStore
    from b3_analytics_engine_spark.tables import load_table

    spark = get_spark(
        app_name="semantic-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n_base = emb.count()
    dim = len(emb.first()["embedding"])

    def synth(n, id_base, salt):
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

    # the daily batch: 100 new + 20 exact copies of corpus vectors
    batch = (
        synth(100, 50_000_000, "batch")
        .unionByName(
            emb.filter(F.col("vec_id") < 20).select(
                (F.col("vec_id") + 60_000_000).alias("vec_id"), "embedding"
            )
        )
        .cache()
    )
    n_batch = batch.count()

    print(
        f"sf_dir={SF_DIR} base={n_base} dim={dim} batch={n_batch} "
        f"threshold={THRESHOLD} iters={ITERS} rounds={N} "
        "(min-of-N, noop-forced; n_centroids scales 16x with corpus)"
    )
    print(
        f"{'corpus':>8s} {'cells':>6s} {'A: restatement':>14s} "
        f"{'B: incremental':>15s} {'index build':>12s}"
    )

    for mult in (1, 8, 64):
        n_cells = 16 * mult
        corpus = emb
        if mult > 1:
            corpus = emb.unionByName(
                synth((mult - 1) * n_base, 10_000_000, f"fill{mult}")
            )
        corpus = corpus.cache()
        n_total = corpus.count()
        root = tempfile.mkdtemp(prefix="semantic_ab_")
        try:
            store = SignatureStore(spark, root)

            def arm_a():
                full = semantic_dedup(
                    corpus.unionByName(batch),
                    threshold=THRESHOLD,
                    n_clusters=n_cells,
                    kmeans_iters=ITERS,
                )
                return full.filter(F.col("vec_id") >= 50_000_000)

            def arm_b():
                return P.incremental_semantic_dedup(
                    batch, store, "c",
                    id_col="vec_id", vec_col="embedding",
                    threshold=THRESHOLD,
                    n_centroids=n_cells,
                    iters=ITERS,
                )

            if mult == 1:
                arm_a().write.format("noop").mode("overwrite").save()
                _unpersist_all(spark)
            a_sec = min(timed(spark, arm_a) for _ in range(N))

            t0 = time.perf_counter()
            store.ivf_index(corpus, "c", n_centroids=n_cells, iters=ITERS)
            build = time.perf_counter() - t0
            _unpersist_all(spark)

            if mult == 1:
                # warm + cross-check: the 20 planted corpus copies
                # must drop in BOTH arms at base scale
                b_keep = {
                    r["vec_id"] for r in arm_b().collect()
                }
                a_keep = {
                    r["vec_id"]
                    for r in arm_a().filter(F.col("keep")).collect()
                }
                planted = {60_000_000 + i for i in range(20)}
                assert not (b_keep & planted), sorted(b_keep & planted)[:5]
                assert not (a_keep & planted), sorted(a_keep & planted)[:5]
                _unpersist_all(spark)
            b_sec = min(timed(spark, arm_b) for _ in range(N))
            print(
                f"{n_total:8d} {n_cells:6d} {a_sec:13.3f}s "
                f"{b_sec:14.3f}s {build:11.3f}s"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
            corpus.unpersist()


if __name__ == "__main__":
    main()
