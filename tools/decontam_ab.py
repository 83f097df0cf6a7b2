#!/usr/bin/env python
"""A/B: eval-side signature artifact for fuzzy decontamination.

The claim under test (`pipelines.decontaminate_fuzzy_cross`): a
recurring decontamination job against a GROWING training corpus should
pay nothing per call for the eval suite — it is small and STATIC, so
its MinHash postings/signatures belong in the SignatureStore exactly
once. Before r12 the production path either re-tokenized the eval
suite per call (mixed frame, no store) or required the eval docs to
pollute the training corpus's artifacts.

Arms (same split, same threshold; results cross-checked identical at
base scale with caps off):
  A: decontaminate_fuzzy(train ∪ eval)            — everything from
     text, per call (the pre-store baseline)
  B: cross operator, train from store, EVAL FROM TEXT per call — the
     best a user could compose before the eval-side artifact
  C: decontaminate_fuzzy_cross(store, store)      — both sides served
     from artifacts (+ the one-time eval build, reported separately)

Train corpus swept ×1/×8 over the sf documents table (synthetic
fill rows with distinct vocabulary); the eval suite stays fixed at
the base table's doc_id % 10 == 0 slice — static, as real eval
benchmarks are.

Usage: python tools/decontam_ab.py  [SPARK_GRAFT_SF_DIR=...]
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
THRESHOLD = 0.12


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
    from b3_analytics_engine_spark.operators import dedup as D
    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.signature_store import SignatureStore
    from b3_analytics_engine_spark.tables import load_table

    spark = get_spark(
        app_name="decontam-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = docs.count()
    eval_df = docs.filter(F.col("doc_id") % 10 == 0).cache()
    n_eval = eval_df.count()
    base_train = docs.filter(F.col("doc_id") % 10 != 0)

    def synth(n, id_base, salt):
        # distinct vocabulary per row: no accidental near-dups
        return spark.range(n).select(
            (F.col("id") + id_base).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit(f"{salt}tok{j}x"),
                        F.xxhash64(F.lit(salt), F.col("id"), F.lit(j)).cast(
                            "string"
                        ),
                    )
                    for j in range(30)
                ],
            ).alias("text"),
        )

    print(
        f"sf_dir={SF_DIR} base_train={n_base - n_eval} eval={n_eval} "
        f"threshold={THRESHOLD} rounds={N} (min-of-N, noop-forced; "
        "caps default-on in every arm)"
    )
    print(
        f"{'train':>8s} {'A: all-from-text':>16s} {'B: eval-from-text':>17s} "
        f"{'C: both-stores':>14s} {'eval build':>11s}"
    )

    for mult in (1, 8):
        train = base_train
        if mult > 1:
            train = train.unionByName(
                synth((mult - 1) * n_base, 10_000_000, f"fill{mult}")
            )
        train = train.cache()
        n_train = train.count()
        mixed = train.unionByName(eval_df)
        root = tempfile.mkdtemp(prefix="decontam_ab_")
        try:
            store = SignatureStore(spark, root)
            # one-time artifact builds (train would exist anyway for
            # dedup; the EVAL build is the cost this round's change
            # amortizes away)
            store.postings(train, "train")
            store.signatures(train, "train")
            store.sizes(train, "train")
            store.band_census(train, "train")
            t0 = time.perf_counter()
            store.postings(eval_df, "evalset")
            store.signatures(eval_df, "evalset")
            eval_build = time.perf_counter() - t0
            _unpersist_all(spark)

            def arm_a():
                return P.decontaminate_fuzzy(
                    mixed, lambda c: c % 10 == 0, threshold=THRESHOLD
                )

            def arm_b():
                # train artifacts, eval re-derived from text per call
                eval_posts = D.hashed_postings(eval_df, "doc_id", "text")
                eval_sig = D._signatures_from_hashed(eval_posts, 64, 42)
                cap = P.DEFAULT_MAX_BAND_BUCKET
                cross = D.minhash_lsh_pairs_cross(
                    eval_posts, eval_sig,
                    store.postings(None, "train"),
                    store.signatures(None, "train"),
                    threshold=THRESHOLD, max_band_bucket=cap,
                    b_sizes=store.sizes(None, "train"),
                    b_hot_buckets=store.band_census(None, "train").filter(
                        F.col("cnt") > cap
                    ),
                )
                return (
                    cross.select(F.col("id_b").alias("doc_id"), "jaccard")
                    .groupBy("doc_id")
                    .agg(
                        F.count(F.lit(1)).alias("n_fuzzy_matches"),
                        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
                    )
                )

            def arm_c():
                return P.decontaminate_fuzzy_cross(
                    None, None, store, "train", "evalset",
                    threshold=THRESHOLD,
                )

            if mult == 1:
                # warm + cross-check: B and C are pair-identical (same
                # artifacts modulo eval origin); A differs only by its
                # both-sides cap, so compare uncapped A vs uncapped C
                b_ids = {r["doc_id"] for r in arm_b().collect()}
                c_ids = {r["doc_id"] for r in arm_c().collect()}
                assert b_ids == c_ids, (len(b_ids), len(c_ids))
                a_unc = {
                    r["doc_id"]
                    for r in P.decontaminate_fuzzy(
                        mixed, lambda c: c % 10 == 0,
                        threshold=THRESHOLD, max_bucket=None,
                    ).collect()
                }
                c_unc = {
                    r["doc_id"]
                    for r in P.decontaminate_fuzzy_cross(
                        None, None, store, "train", "evalset",
                        threshold=THRESHOLD, max_bucket=None,
                    ).collect()
                }
                assert a_unc == c_unc, (len(a_unc), len(c_unc))
                _unpersist_all(spark)
            a_sec = min(timed(spark, arm_a) for _ in range(N))
            b_sec = min(timed(spark, arm_b) for _ in range(N))
            c_sec = min(timed(spark, arm_c) for _ in range(N))
            print(
                f"{n_train:8d} {a_sec:15.3f}s {b_sec:16.3f}s "
                f"{c_sec:13.3f}s {eval_build:10.3f}s"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
            train.unpersist()


if __name__ == "__main__":
    main()
