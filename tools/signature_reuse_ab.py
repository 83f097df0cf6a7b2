#!/usr/bin/env python
"""A/B: MinHash-family consumers from raw text vs from persisted
SignatureStore artifacts (r9 verdict task #3).

Two consumers share one corpus snapshot:
  - dedup pass:      minhash_lsh_pairs (threshold 0.12)
  - decontamination: pipelines.decontaminate_fuzzy (same params)

Arm A recomputes postings+signatures from text inside each consumer.
Arm B pays a one-time store build, then each consumer reads the
Parquet artifacts. The claim under test: the SECOND consumer's
signature cost is ~0 (a Parquet scan), so N passes cost
build + N·(join work), not N·(tokenize+hash+aggregate+join).

Usage: python tools/signature_reuse_ab.py  [SPARK_GRAFT_SF_DIR=...]
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
    from b3_analytics_engine_spark import pipelines as P
    from b3_analytics_engine_spark.operators import dedup as D
    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.signature_store import SignatureStore
    from b3_analytics_engine_spark.tables import load_table

    spark = get_spark(
        app_name="signature-reuse-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()  # warm page cache / JVM
    is_eval = lambda c: c % 10 == 0  # noqa: E731

    root = tempfile.mkdtemp(prefix="sigstore_ab_")
    try:
        store = SignatureStore(spark, root)

        def dedup_from_text():
            return D.minhash_lsh_pairs(docs, threshold=0.12)

        def decon_from_text():
            return P.decontaminate_fuzzy(docs, is_eval, threshold=0.12)

        def dedup_from_store():
            return D.minhash_lsh_pairs(
                docs, threshold=0.12,
                posts=store.postings(docs, "d"),
                sig=store.signatures(docs, "d"),
            )

        def decon_from_store():
            return P.decontaminate_fuzzy(
                docs, is_eval, threshold=0.12, store=store, corpus="d"
            )

        # one untimed warmup of the from-text plan (codegen one-offs)
        dedup_from_text().write.format("noop").mode("overwrite").save()
        _unpersist_all(spark)

        a_dedup = min(timed(spark, dedup_from_text) for _ in range(N))
        a_decon = min(timed(spark, decon_from_text) for _ in range(N))

        t0 = time.perf_counter()
        store.signatures(docs, "d")  # builds postings + signatures
        build = time.perf_counter() - t0
        _unpersist_all(spark)

        b_dedup = min(timed(spark, dedup_from_store) for _ in range(N))
        b_decon = min(timed(spark, decon_from_store) for _ in range(N))

        rows = sorted(
            tuple(r) for r in dedup_from_store().collect()
        )
        assert rows == sorted(tuple(r) for r in dedup_from_text().collect()), (
            "store-backed pairs diverged from from-text pairs"
        )

        print(f"sf_dir={SF_DIR} rounds={N} (min-of-N, noop-forced)")
        print(f"one-time store build (postings+signatures): {build:7.3f}s")
        print(f"{'consumer':28s} {'from-text':>10s} {'from-store':>11s}")
        print(f"{'dedup pairs (lsh 0.12)':28s} {a_dedup:10.3f} {b_dedup:11.3f}")
        print(f"{'decontaminate_fuzzy':28s} {a_decon:10.3f} {b_decon:11.3f}")
        tot_a = a_dedup + a_decon
        tot_b = build + b_dedup + b_decon
        print(f"{'2-consumer total':28s} {tot_a:10.3f} {tot_b:11.3f} "
              f"(incl. build)")
        print("results cross-checked identical: yes")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
