#!/usr/bin/env python
"""A/B: incremental batch dedup vs full-corpus restatement.

The claim under test (`pipelines.incremental_dedup`): deduplicating a
new batch against a corpus whose artifacts are already persisted costs
O(batch) compute + artifact-scan I/O — NOT the O(corpus) tokenize +
shingle + hash + band-join of re-running `corpus_dedup` over
corpus ∪ batch. At 100 TB the difference is a job that reprocesses
the entire history every day vs one that touches only the day's data.

Arms (same batch, same thresholds; survivor sets cross-checked at the
base corpus scale):
  A: corpus_dedup(corpus ∪ batch) from text — the restatement cost
  B: incremental_dedup(batch) against the stored snapshot
     (+ the one-time snapshot build, reported separately, and the
     O(batch) commit)

The corpus is swept through size multipliers (×1, ×8, ×32 — the base
documents table padded with DISTINCT 32-token synthetic docs, so pair
work stays constant while tokenize/signature volume grows): arm A
must grow with the corpus, arm B must stay ~flat (its corpus-side
cost is a narrow artifact scan, not a re-tokenize). That slope
difference — not the absolute number at any one size — is the
O(corpus)-recompute vs O(batch)-compute claim.

Batch mix: exact copies of corpus docs, near-dups of corpus docs,
within-batch dup pairs, and genuinely new (mutually dissimilar)
documents.

Usage: python tools/incremental_ab.py  [SPARK_GRAFT_SF_DIR=...]
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
THRESHOLD = 0.5


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
    from b3_analytics_engine_spark.session import get_spark
    from b3_analytics_engine_spark.signature_store import SignatureStore
    from b3_analytics_engine_spark.tables import load_table

    spark = get_spark(
        app_name="incremental-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_corpus = docs.count()  # warm page cache / JVM
    base = 10_000_000
    filler_base = 50_000_000

    def distinct_docs(n, id_base, salt, ntok=8):
        """n documents with zero shared shingles across docs: each text
        is ``ntok`` unique 64-hex tokens derived from (salt, id, k)."""
        toks = [
            F.sha2(
                F.concat_ws(":", F.lit(salt), F.col("id").cast("string"),
                            F.lit(str(k))),
                256,
            )
            for k in range(ntok)
        ]
        return spark.range(n).select(
            (F.col("id") + id_base).alias("doc_id"),
            F.concat_ws(" ", *toks).alias("text"),
        )

    # batch = 100 exact corpus copies + 50 near-dups of corpus docs
    #         + 25 within-batch dup pairs + 100 new dissimilar docs
    from pyspark.sql import Window

    ranked = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )  # global window: fine at tool scale, never in product code
    exact = ranked.filter(F.col("rn") <= 100).select(
        (F.col("doc_id") + base).alias("doc_id"), "text"
    )
    near = ranked.filter(F.col("rn").between(101, 150)).select(
        (F.col("doc_id") + base + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" incremental batch suffix token"))
        .alias("text"),
    )
    fresh = distinct_docs(100, base + 2000, "fresh")
    within_dup = fresh.limit(25).select(
        (F.col("doc_id") + 500).alias("doc_id"), "text"
    )
    batch = exact.unionByName(near).unionByName(fresh).unionByName(within_dup)
    batch = batch.cache()
    n_batch = batch.count()

    print(
        f"sf_dir={SF_DIR} base_corpus={n_corpus} batch={n_batch} "
        f"threshold={THRESHOLD} rounds={N} (min-of-N, noop-forced)"
    )
    print(
        f"{'corpus':>8s} {'A: full restate':>15s} {'B: incremental':>15s} "
        f"{'snapshot build':>15s}"
    )

    def dir_bytes(path: str) -> int:
        total = 0
        for dp, _dn, fn in os.walk(path):
            for f in fn:
                total += os.path.getsize(os.path.join(dp, f))
        return total

    rows = []
    mults = tuple(
        int(m) for m in os.environ.get("AB_MULTS", "1,8,64").split(",")
    )
    for mult in mults:
        corpus = docs
        if mult > 1:
            # 32-token filler: heavy enough that arm A's per-doc
            # tokenize/shingle/minhash compute dominates fixed stage
            # overhead as the corpus grows
            corpus = docs.unionByName(
                distinct_docs(
                    (mult - 1) * n_corpus, filler_base, f"fill{mult}",
                    ntok=32,
                )
            )
        corpus = corpus.cache()
        n_total = corpus.count()

        root = tempfile.mkdtemp(prefix="incr_ab_")
        try:
            store = SignatureStore(spark, root)

            def arm_a():
                return P.corpus_dedup(
                    corpus.unionByName(batch), "minhash", threshold=THRESHOLD
                )

            def arm_b():
                return P.incremental_dedup(
                    batch, store, "c", threshold=THRESHOLD
                )

            # one untimed warmup of each arm's plan shape (codegen,
            # broadcast thread pools, shuffle service) before timing
            if mult == 1:
                arm_a().write.format("noop").mode("overwrite").save()
                _unpersist_all(spark)
            a_sec = min(timed(spark, arm_a) for _ in range(N))

            t0 = time.perf_counter()
            store.fingerprints(corpus, "c")
            store.signatures(corpus, "c")  # builds postings too
            store.sizes(corpus, "c")  # derived aggregates: pay once
            store.band_census(corpus, "c")
            build = time.perf_counter() - t0
            _unpersist_all(spark)
            # the I/O story wall time can't show at toy scale: arm A
            # re-reads + re-tokenizes every corpus text byte per run;
            # arm B's corpus-side input is the artifact parquet alone
            text_mb = (
                corpus.select(
                    F.sum(F.octet_length("text")).alias("b")
                ).first()["b"] or 0
            ) / 1e6
            art_mb = dir_bytes(root) / 1e6

            if mult == 1:
                arm_b().write.format("noop").mode("overwrite").save()
                _unpersist_all(spark)
            b_sec = min(timed(spark, arm_b) for _ in range(N))
            rows.append((n_total, a_sec, b_sec, build))
            print(
                f"{n_total:8d} {a_sec:14.3f}s {b_sec:14.3f}s {build:14.3f}s"
                f"   text={text_mb:8.1f}MB artifacts={art_mb:8.1f}MB"
            )

            if mult == 1:
                # semantics cross-check + O(batch) commit, base scale only
                t0 = time.perf_counter()
                survivors = P.incremental_dedup(
                    batch, store, "c", threshold=THRESHOLD,
                    commit_batch="day1",
                )
                got = sorted(r["doc_id"] for r in survivors.collect())
                commit_sec = time.perf_counter() - t0
                _unpersist_all(spark)
                want = sorted(
                    r["doc_id"]
                    for r in arm_a().collect()
                    if r["doc_id"] >= base
                )
                assert got == want, (
                    f"survivor mismatch: {len(got)} vs {len(want)}"
                )
                print(
                    f"batch survivors {len(got)}/{n_batch} == arm A's "
                    f"batch cut; commit incl. append {commit_sec:.3f}s"
                )
        finally:
            shutil.rmtree(root, ignore_errors=True)
            corpus.unpersist()
            _unpersist_all(spark)

    (c0, a0, b0, _), (c1, a1, b1, _) = rows[0], rows[-1]
    print(
        f"corpus x{c1 / c0:.0f}: arm A x{a1 / a0:.2f}, arm B x{b1 / b0:.2f} "
        "(restatement scales with corpus; incremental ~flat)"
    )
    batch.unpersist()


if __name__ == "__main__":
    main()
