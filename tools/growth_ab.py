#!/usr/bin/env python
"""A/B: probe cost under pure UNIFORM corpus growth, balance gate vs
occupancy gate (`ivf_maybe_retrain(rescale_occupancy=...)`, r13).

The claim under test: `balance` (max/mean occupied-cell ratio) is
scale-invariant — a corpus that grows uniformly keeps balance ~1
while every probe's per-cell scan cost climbs at
O(total / n_centroids). The pre-r13 maintenance loop gated BOTH the
retrain and the rescale escalation on balance, so on pure growth it
never fired at all (measured below: the balance-gated call returns
-1 against a corpus whose probes have degraded 9x). The r13
occupancy gate (`rescale_occupancy` = target mean rows per occupied
cell) catches exactly this case and escalates straight to an
in-place `ivf_rescale`, auto-sized `ceil(total/target)` so one
rescale restores the per-probe target.

Setup: base `embeddings` corpus indexed at 16 cells; GROWTH_MULT x
base rows appended in one commit, drawn from the SAME distribution
(the base vectors re-id'd with deterministic per-copy jitter — the
"more of the same data" influx, the opposite of retrain_ab's drift).
Queries are base-region vectors, nprobe=1.

Reported per phase: balance (shows the old gate's blind spot stays
~1 throughout), MEAN ROWS one query's probe scans, min-of-N probe
wall time, and recall@5 vs the exact brute-force neighbors over the
SAME live corpus view (the knob interaction the occupancy A/B alone
misses: the auto-rescale multiplies the cell count while nprobe
stays fixed, so each probe covers a smaller fraction of the corpus —
this column measures what that does to recall); plus the miss/fire
verdict of each gate and the one-time rescale cost.

Usage: python tools/growth_ab.py  [SPARK_GRAFT_SF_DIR=...]
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
GROWTH_MULT = 8  # appended rows = GROWTH_MULT x base rows


def _unpersist_all(spark) -> None:
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()


def main() -> None:
    from pyspark.sql import functions as F

    from b3_analytics_engine_spark.operators.similarity import (
        cosine_ann_ivf_indexed,
        cosine_topk_bruteforce,
        ivf_assignments,
    )
    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.signature_store import SignatureStore
    from b3_analytics_engine_spark.tables import load_table

    spark = get_spark(
        app_name="growth-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n_base = emb.count()

    # uniform growth: the SAME distribution under fresh ids — each
    # copy k jitters every component by a deterministic ±2% so the
    # copies are distinct vectors but cell shares are preserved
    def grown(mult: int):
        out = None
        for k in range(1, mult + 1):
            jit = (
                (
                    F.pmod(
                        F.xxhash64(F.lit("grow"), F.col("vec_id"), F.lit(k)),
                        F.lit(2001),
                    )
                    - 1000
                )
                / 1000.0
            ) * 0.02
            part = emb.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: (x * (1.0 + jit)).cast("float")
                ).alias("embedding"),
            )
            out = part if out is None else out.unionByName(part)
        return out

    queries = emb.limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).cache()
    queries.count()

    root = tempfile.mkdtemp(prefix="growth_ab_")
    try:
        store = SignatureStore(spark, root)
        store.ivf_index(emb, "c", n_centroids=N_CELLS, iters=ITERS)
        base_stats = store.ivf_cell_stats("c", N_CELLS, ITERS)
        base_occ = base_stats["total"] / base_stats["occupied"]

        def probe(cells=N_CELLS):
            return cosine_ann_ivf_indexed(
                store, "c", queries, k=5,
                n_centroids=cells, kmeans_iters=ITERS, nprobe=1,
            )

        def rows_scanned(cells=N_CELLS):
            C = store.ivf_centroids(None, "c", n_centroids=cells,
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
            stats = store.ivf_cell_stats("c", cells, ITERS)
            mean = sum(stats["cells"].get(c, 0) for c in per_q) / len(per_q)
            return int(mean), stats

        def timed_probe(cells=N_CELLS):
            t0 = time.perf_counter()
            probe(cells).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            _unpersist_all(spark)
            return dt

        def recall5(cells=N_CELLS):
            # recall@5 of the nprobe=1 probe vs the exact neighbors
            # over the SAME live (base+deltas) corpus view. Both
            # result sets are k x |queries| rows (40), so collect
            # once each and intersect driver-side — re-using the
            # exact frame in a join would re-run the O(|corpus| x
            # |queries|) brute-force scan per reference
            live = store.ivf_index(
                None, "c", n_centroids=cells, iters=ITERS
            ).select(
                F.col("id").alias("vec_id"), F.col("v").alias("embedding")
            )
            exact = {
                (r["query_id"], r["neighbor_id"])
                for r in cosine_topk_bruteforce(live, queries, k=5)
                .select("query_id", "neighbor_id").collect()
            }
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in probe(cells)
                .select("query_id", "neighbor_id").collect()
            }
            _unpersist_all(spark)
            return len(exact & got) / len(exact) if exact else float("nan")

        total = (GROWTH_MULT + 1) * n_base
        target = base_occ * 1.5  # allow 50% growth per cell, then repair
        print(
            f"sf_dir={SF_DIR} base={n_base} grown=+{GROWTH_MULT * n_base} "
            f"total={total} cells={N_CELLS} nprobe=1 rounds={N} "
            f"occupancy_target={target:.0f}"
        )
        print(f"{'phase':>14s} {'balance':>8s} {'rows/query':>11s} "
              f"{'probe sec':>10s} {'recall@5':>9s}")
        probe().write.format("noop").mode("overwrite").save()  # warm
        _unpersist_all(spark)

        rows, stats = rows_scanned()
        sec = min(timed_probe() for _ in range(N))
        print(f"{'base':>14s} {stats['balance']:8.2f} {rows:11d} "
              f"{sec:10.3f}s {recall5():9.3f}")

        store.ivf_append(grown(GROWTH_MULT), "c", "growth",
                         n_centroids=N_CELLS, iters=ITERS)
        rows, stats = rows_scanned()
        sec = min(timed_probe() for _ in range(N))
        print(f"{'grown 9x':>14s} {stats['balance']:8.2f} {rows:11d} "
              f"{sec:10.3f}s {recall5():9.3f}")

        # the pre-r13 configuration: balance-gated only -> must MISS
        miss = store.ivf_maybe_retrain(
            "c", n_centroids=N_CELLS, iters=ITERS,
            max_balance=4.0, rescale_balance=4.0,
        )
        print(f"{'balance gate':>14s} {'—':>8s} {'—':>11s} {'—':>10s}  "
              f"<- returns {miss} (blind to growth: balance "
              f"{stats['balance']:.2f} <= 4.0)")

        # the r13 occupancy gate: fires, escalates straight to an
        # auto-sized in-place rescale
        t0 = time.perf_counter()
        folded = store.ivf_maybe_retrain(
            "c", n_centroids=N_CELLS, iters=ITERS,
            max_balance=4.0, rescale_occupancy=target,
        )
        fix_sec = time.perf_counter() - t0
        _unpersist_all(spark)
        cells = store.ivf_active("c")[0]
        print(f"{'(occupancy)':>14s} {'':8s} {folded:>11d} "
              f"{fix_sec:10.3f}s  <- fired: rescaled in place to "
              f"{cells} cells, one-time")

        probe(cells).write.format("noop").mode("overwrite").save()  # warm
        _unpersist_all(spark)
        rows, stats = rows_scanned(cells)
        sec = min(timed_probe(cells) for _ in range(N))
        print(f"{'rescaled':>14s} {stats['balance']:8.2f} {rows:11d} "
              f"{sec:10.3f}s {recall5(cells):9.3f}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
