"""Hot-bucket cap behavior under a synthetic mega-cluster (r8 verdict
task #4): a corpus where one near-identical cluster dominates must not
produce quadratic candidate pairs once the caps are on — and the
pipeline entry points (`pipelines.neardup_pairs` / `corpus_dedup`)
must have them on BY DEFAULT, while the operator layer keeps None
(bit-exact oracle parity for the registered queries).

The quadratic blowup being guarded: a bucket of B rows emits
B(B-1)/2 self-join candidates in ONE task. The tests build clusters
big enough that the uncapped pair count is O(B^2) and assert the
capped path stays below a linear bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import local_df

from b3_analytics_engine_spark import pipelines as P
from b3_analytics_engine_spark.operators import dedup as D
from b3_analytics_engine_spark.operators import similarity as S

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles carry ancient maps across the quiet river delta "
    "under a pale winter moon"
)


def _mega_corpus(spark, n_cluster: int, n_unique: int = 5):
    """n_cluster byte-identical docs + n_unique genuinely distinct ones."""
    rows = [(i, BASE) for i in range(n_cluster)]
    rows += [
        (n_cluster + j, f"unique document number {j} about topic {j * 17} "
                        f"with entirely different words like zephyr{j} "
                        f"quartz{j} oblong{j} marmalade{j}")
        for j in range(n_unique)
    ]
    return local_df(spark, rows, "doc_id long, text string")


def test_minhash_cap_bounds_candidates(spark):
    # shingle/hash ONCE, shared by the capped and uncapped runs (the
    # cap behavior under test is the banding, not the shingling —
    # r11 verdict task #3, gate work reduction)
    from b3_analytics_engine_spark.operators.common import materialize

    docs = _mega_corpus(spark, 120)
    posts = D.hashed_postings(docs, "doc_id", "text").transform(materialize)
    sig = D._signatures_from_hashed(posts, 64, 42).transform(materialize)
    uncapped = D.minhash_lsh_pairs(
        docs, threshold=0.5, posts=posts, sig=sig
    ).count()
    capped = D.minhash_lsh_pairs(
        docs, threshold=0.5, max_band_bucket=16, posts=posts, sig=sig
    ).count()
    # identical docs -> identical signatures -> one (band, bh) bucket
    # per band holding all 120 -> quadratic uncapped, dropped capped
    assert uncapped == 120 * 119 // 2
    assert capped <= 120 * 16  # sub-quadratic bound (here: 0)


def test_ngram_jaccard_shingle_df_cap(spark):
    # posting-list analog of the banding caps, now unified onto
    # drop_hot_buckets: shingles held by more docs than the cap are
    # dropped before the self-join; identical docs share ALL shingles
    # so the capped run yields no pairs, the uncapped run is quadratic
    from b3_analytics_engine_spark.operators.common import materialize

    docs = _mega_corpus(spark, 60)
    posts = D.hashed_postings(docs, "doc_id", "text").transform(materialize)
    uncapped = D.ngram_jaccard_pairs(
        docs, threshold=0.5, posts=posts
    ).count()
    capped = D.ngram_jaccard_pairs(
        docs, threshold=0.5, max_shingle_df=16, posts=posts
    ).count()
    assert uncapped == 60 * 59 // 2
    assert capped <= 60 * 16  # sub-quadratic bound (here: 0)


def test_simhash_cap_bounds_candidates(spark):
    from b3_analytics_engine_spark.operators.common import materialize

    docs = _mega_corpus(spark, 120)
    sig = D.simhash_signatures(docs, "doc_id", "text").transform(materialize)
    uncapped = D.simhash_pairs(docs, sig=sig).count()
    capped = D.simhash_pairs(docs, max_chunk_bucket=16, sig=sig).count()
    assert uncapped == 120 * 119 // 2
    assert capped <= 120 * 16


def test_embedding_cap_bounds_candidates(spark):
    n = 120
    vec = [1.0] + [0.0] * 63
    rows = [(i, vec) for i in range(n)]
    rows += [(n + j, [float(k == j + 1) for k in range(64)]) for j in range(5)]
    embs = local_df(spark, rows, "vec_id long, embedding array<double>")
    uncapped = S.embedding_neardup_pairs(embs, threshold=0.99).count()
    capped = S.embedding_neardup_pairs(
        embs, threshold=0.99, max_bucket=16
    ).count()
    assert uncapped == n * (n - 1) // 2
    assert capped <= n * 16


def test_pipeline_default_caps_are_on(spark):
    # 1500 > DEFAULT_MAX_BAND_BUCKET=1024: with the default cap the
    # mega-cluster's band buckets are all dropped before the
    # self-join, so the pair count stays linear-bounded instead of
    # the ~1.1M the uncapped quadratic path would emit (which this
    # test deliberately never runs).
    n = 1500
    assert n > P.DEFAULT_MAX_BAND_BUCKET
    docs = _mega_corpus(spark, n)
    pairs = P.neardup_pairs(docs, "minhash", threshold=0.5)
    assert pairs.count() < n
    # explicit opt-out restores the operator-layer exact semantics
    few = _mega_corpus(spark, 30)
    assert P.neardup_pairs(few, "minhash", threshold=0.5,
                           max_bucket=None).count() == 30 * 29 // 2


def test_corpus_dedup_end_to_end(spark):
    # 10 byte-identical copies (exact tier), 3 near-identical
    # variants that share ~86% of their shingles with BASE (near-dup
    # tier connects them to the exact tier's survivor), 5 unique ->
    # one representative of the whole {BASE, variants} cluster plus
    # the 5 unique docs survive.
    rows = [(i, BASE) for i in range(10)]
    rows += [(10 + v, BASE + f" trailing variant token {v}") for v in range(3)]
    rows += [
        (13 + j, f"standalone text {j} full of unrelated vocabulary "
                 f"such as nimbus{j} parallax{j} crucible{j}")
        for j in range(5)
    ]
    docs = local_df(spark, rows, "doc_id long, text string")
    kept = P.corpus_dedup(docs, "minhash", threshold=0.5)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [0, 13, 14, 15, 16, 17]
    # all original columns survive
    assert kept.columns == ["doc_id", "text"]


def test_corpus_dedup_final_frame_scans_corpus_once(spark):
    # the survivor frame must read the raw corpus ONCE: the exact
    # tier's keep set is materialized (id column only), so the final
    # semi+anti join reads the cache, not a second fingerprint pass —
    # at 100 TB a recomputed keep set is a full corpus md5 re-scan
    from b3_analytics_engine_spark.plans import parquet_scan_counts
    from b3_analytics_engine_spark.tables import SMOKE_SF_DIR, load_table

    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    out = P.corpus_dedup(docs, "minhash", threshold=0.5)
    # <= 2: one live scan (the semi+anti join's corpus side) plus the
    # one scan embedded in the cached keep set's stored lineage —
    # parquet_scan_counts reads the textual plan, which prints an
    # InMemoryRelation's (compute-once) subplan too
    assert parquet_scan_counts(out).get("documents", 0) <= 2


def test_corpus_dedup_null_text_passes_through(spark):
    # md5(NULL) is NULL and groupBy treats NULL as a regular key — an
    # unguarded exact tier would collapse ALL NULL-text rows into one
    # "duplicate group" and drop every one but min(id). They are not
    # copies of each other: every NULL-text row must survive.
    rows = [(0, BASE), (1, BASE)]  # one real duplicate pair
    rows += [(10, None), (11, None), (12, None)]  # distinct docs, text lost
    rows += [(20, "a totally unrelated document about quasar physics")]
    docs = local_df(spark, rows, "doc_id long, text string")
    kept = P.corpus_dedup(docs, "minhash", threshold=0.5)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [0, 10, 11, 12, 20]
