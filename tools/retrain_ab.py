#!/usr/bin/env python
"""A/B: probe cost against a drifted IVF index, before vs after
`ivf_retrain`.

The claim under test (`SignatureStore.ivf_retrain` +
`ivf_cell_stats`): appends assign against FROZEN centroids, so a
drifted embedding distribution piles new vectors into a few hot
cells — and probe cost is per-cell scan cost, so queries in the
drifted region degrade toward a full-corpus scan. Retraining the
quantizer from the index's own rows restores per-cell balance and
with it the O(corpus / n_centroids) probe.

Setup: base corpus from `embeddings`, then a drifted batch of
DRIFT_MULT × base rows appended in one commit (all sharing one
dominant off-corpus axis, noise wide enough that they are NOT
mutual near-dups — a realistic new-domain influx, not a dup storm).
Queries live in the drifted region, nprobe=1.

Reported per phase: cell-balance ratio, MEAN ROWS one query's probe
scans (the deterministic, hardware-independent cost), and min-of-N
probe wall time; plus the one-time retrain cost. Two honest limits
measured: (1) repair depth is iteration-bound (seeds are the first
sample vectors by id, i.e. base-region ids — sweep AB_ITERS); (2) a
tight single-direction cosine blob resists subdivision at a FIXED
cell count (spherical k-means centroids inside a high-mutual-cosine
region collapse toward one direction), so the third phase measures
the rescale path: rebuild from the index's own rows at 4x the cells,
which is where the per-query probe actually returns to
O(corpus / n_cells).

Usage: python tools/retrain_ab.py  [SPARK_GRAFT_SF_DIR=...]
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
N = int(os.environ.get("AB_ROUNDS", "5"))
N_CELLS = 16
ITERS = int(os.environ.get("AB_ITERS", "3"))
DRIFT_MULT = 8  # drifted rows = DRIFT_MULT x base rows


def _unpersist_all(spark) -> None:
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from b3_analytics_engine_spark.operators.similarity import (
        cosine_ann_ivf_indexed,
        ivf_assignments,
    )
    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.signature_store import SignatureStore
    from b3_analytics_engine_spark.tables import load_table

    spark = get_spark(
        app_name="retrain-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n_base = emb.count()
    dim = len(emb.first()["embedding"])

    # drifted region: one dominant axis the corpus doesn't use, wide
    # noise so the batch is internally diverse (cos ~0.9, not dups)
    def drift(n, id_base):
        j = dim - 1
        cols = []
        for k in range(dim):
            noise = (
                (
                    F.pmod(
                        F.xxhash64(F.lit("drift"), F.col("id"), F.lit(k)),
                        F.lit(2001),
                    )
                    - 1000
                )
                / 1000.0
            ) * 0.4
            cols.append(
                (noise + (F.lit(5.0) if k == j else F.lit(0.0))).cast("float")
            )
        return spark.range(n).select(
            (F.col("id") + id_base).alias("vec_id"),
            F.array(*cols).alias("embedding"),
        )

    queries = drift(8, 90_000_000).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).cache()
    queries.count()

    root = tempfile.mkdtemp(prefix="retrain_ab_")
    try:
        store = SignatureStore(spark, root)
        store.ivf_index(emb, "c", n_centroids=N_CELLS, iters=ITERS)
        batch = drift(DRIFT_MULT * n_base, 10_000_000)
        store.ivf_append(batch, "c", "influx", n_centroids=N_CELLS,
                         iters=ITERS)

        def probe(corpus="c", cells=N_CELLS):
            return cosine_ann_ivf_indexed(
                store, corpus, queries, k=5,
                n_centroids=cells, kmeans_iters=ITERS, nprobe=1,
            )

        def rows_scanned(corpus="c", cells=N_CELLS):
            """MEAN rows one query's probe scans (its probed cell's
            occupancy) — the per-query unit; a union across queries
            would hide the win once each query probes its own cell."""
            C = store.ivf_centroids(None, corpus, n_centroids=cells,
                                    iters=ITERS)
            per_q = [
                r["cell"]
                for r in ivf_assignments(
                    queries.select(
                        "query_id", F.col("embedding").alias("_v")
                    ),
                    C, "query_id", "_v", nprobe=1,
                ).collect()
            ]
            stats = store.ivf_cell_stats(corpus, cells, ITERS)
            mean = sum(stats["cells"].get(c, 0) for c in per_q) / len(per_q)
            return int(mean), stats

        def timed_probe(corpus="c", cells=N_CELLS):
            t0 = time.perf_counter()
            probe(corpus, cells).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            _unpersist_all(spark)
            return dt

        total = (DRIFT_MULT + 1) * n_base
        print(
            f"sf_dir={SF_DIR} base={n_base} drifted={DRIFT_MULT * n_base} "
            f"total={total} cells={N_CELLS} nprobe=1 rounds={N}"
        )
        print(
            f"{'phase':>14s} {'balance':>8s} {'rows/query':>11s} "
            f"{'probe sec':>10s}"
        )
        probe().write.format("noop").mode("overwrite").save()  # warm
        _unpersist_all(spark)
        for phase in ("drifted", "retrained"):
            rows, stats = rows_scanned()
            sec = min(timed_probe() for _ in range(N))
            print(
                f"{phase:>14s} {stats['balance']:8.2f} {rows:11d} "
                f"{sec:10.3f}s"
            )
            if phase == "drifted":
                t0 = time.perf_counter()
                folded = store.ivf_retrain("c", n_centroids=N_CELLS,
                                           iters=ITERS)
                retrain_sec = time.perf_counter() - t0
                _unpersist_all(spark)
                print(
                    f"{'(retrain)':>14s} {'':8s} {folded:>11d} "
                    f"{retrain_sec:10.3f}s  <- one-time, folds deltas"
                )

        # phase 3: the rescale path — 4x cells, rebuilt in place from
        # the index's own rows (no source-lake re-read); first-class
        # as SignatureStore.ivf_rescale since r12 (same corpus name,
        # ledger carried, old family GC'd)
        big = 4 * N_CELLS
        t0 = time.perf_counter()
        store.ivf_rescale(
            "c", n_centroids=N_CELLS, iters=ITERS, new_n_centroids=big
        )
        rescale_sec = time.perf_counter() - t0
        _unpersist_all(spark)
        probe("c", big).write.format("noop").mode("overwrite").save()  # warm
        _unpersist_all(spark)
        rows, stats = rows_scanned("c", big)
        sec = min(timed_probe("c", big) for _ in range(N))
        print(
            f"{'rescaled 4x':>14s} {stats['balance']:8.2f} {rows:11d} "
            f"{sec:10.3f}s  (rescale build {rescale_sec:.3f}s)"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
