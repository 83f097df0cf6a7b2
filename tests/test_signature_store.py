"""SignatureStore: persisted MinHash artifacts must be row-identical
to the from-text computation, be written exactly once (read-through),
and plug into the pipeline entry points without changing results
(r9 verdict task #3)."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from conftest import local_df

from b3_analytics_engine_spark import pipelines as P
from b3_analytics_engine_spark.operators import dedup as D
from b3_analytics_engine_spark.signature_store import SignatureStore
from b3_analytics_engine_spark.tables import SMOKE_SF_DIR, load_table


@pytest.fixture()
def docs(spark):
    return load_table(spark, SMOKE_SF_DIR, "documents")


# The fingerprint + signature first build costs several Spark write
# jobs; most tests below treat it as a mere PRECONDITION. Build it
# once per module and give each test a private filesystem copy
# (milliseconds) — first-build behavior itself stays covered by the
# row-identity / read-through tests, which still build fresh.
@pytest.fixture(scope="module")
def _prebuilt_docs_store(spark, tmp_path_factory):
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    root = str(tmp_path_factory.mktemp("prebuilt-minhash") / "store")
    s = SignatureStore(spark, root)
    s.fingerprints(docs, "docs")
    s.signatures(docs, "docs")
    s.postings(docs, "docs")
    return root


@pytest.fixture(scope="module")
def _prebuilt_docs_store_simhash(spark, tmp_path_factory, _prebuilt_docs_store):
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    root = str(tmp_path_factory.mktemp("prebuilt-simhash") / "store")
    shutil.copytree(_prebuilt_docs_store, root)
    s = SignatureStore(spark, root)
    s.simhash(docs, "docs")
    s.simhash_census(docs, "docs")
    return root


@pytest.fixture()
def docs_store_dir(tmp_path, _prebuilt_docs_store):
    dst = str(tmp_path / "store")
    shutil.copytree(_prebuilt_docs_store, dst)
    return dst


@pytest.fixture()
def docs_store(spark, docs_store_dir):
    return SignatureStore(spark, docs_store_dir)


@pytest.fixture()
def docs_simhash_store(spark, tmp_path, _prebuilt_docs_store_simhash):
    dst = str(tmp_path / "store")
    shutil.copytree(_prebuilt_docs_store_simhash, dst)
    return SignatureStore(spark, dst)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_postings_artifact_row_identical(spark, docs, tmp_path):
    store = SignatureStore(spark, str(tmp_path / "store"))
    from_store = store.postings(docs, "docs")
    from_text = D.hashed_postings(docs, "doc_id", "text")
    assert _sorted_rows(from_store) == _sorted_rows(from_text)


def test_signatures_artifact_row_identical(spark, docs, tmp_path):
    store = SignatureStore(spark, str(tmp_path / "store"))
    from_store = store.signatures(docs, "docs")
    from_text = D.minhash_signatures(docs, "doc_id", "text")
    assert _sorted_rows(from_store) == _sorted_rows(from_text)


def test_read_through_writes_once_and_scans_parquet(spark, docs, tmp_path):
    store = SignatureStore(spark, str(tmp_path / "store"))
    path = store.postings_path("docs")
    store.postings(docs, "docs")
    files_first = sorted(glob.glob(os.path.join(path, "*.parquet")))
    mtimes_first = [os.path.getmtime(f) for f in files_first]

    again = store.postings(docs, "docs")
    # the second call's scan reads the ARTIFACT, not the corpus
    inputs = again.inputFiles()
    assert inputs and all("hashed_postings" in f for f in inputs)
    assert not any("documents" in f for f in inputs)
    # ... and nothing was rewritten
    files_second = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert files_second == files_first
    assert [os.path.getmtime(f) for f in files_second] == mtimes_first

    # refresh=True DOES rewrite (corpus-snapshot invalidation path)
    store.postings(docs, "docs", refresh=True)
    assert [
        os.path.getmtime(f)
        for f in sorted(glob.glob(os.path.join(path, "*.parquet")))
    ] != mtimes_first


def test_minhash_pairs_from_store_match_from_text(spark, docs, docs_store):
    # parity given artifacts — the prebuilt store serves them; build
    # behavior itself stays covered by the row-identity/read-through
    # tests above, which still build fresh
    store = docs_store
    posts = store.postings(None, "docs")
    sig = store.signatures(None, "docs")
    via_store = D.minhash_lsh_pairs(docs, threshold=0.12, posts=posts, sig=sig)
    via_text = D.minhash_lsh_pairs(docs, threshold=0.12)
    assert _sorted_rows(via_store) == _sorted_rows(via_text)


def test_simhash_artifact_and_pairs_row_identical(spark, docs, tmp_path):
    store = SignatureStore(spark, str(tmp_path / "store"))
    sig = store.simhash(docs, "docs")
    assert _sorted_rows(sig) == _sorted_rows(
        D.simhash_signatures(docs, "doc_id", "text")
    )
    via_store = D.simhash_pairs(docs, sig=sig)
    assert _sorted_rows(via_store) == _sorted_rows(D.simhash_pairs(docs))


def test_ngram_jaccard_from_store_posts_row_identical(spark, docs, docs_store):
    posts = docs_store.postings(None, "docs")  # portable=False = the
    # operator's own xxhash64 keying, so the artifact is share-safe
    via_store = D.ngram_jaccard_pairs(docs, threshold=0.12, posts=posts)
    via_text = D.ngram_jaccard_pairs(docs, threshold=0.12)
    assert _sorted_rows(via_store) == _sorted_rows(via_text)


def test_corpus_dedup_with_store_matches_without(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carry ancient maps across the quiet river delta"
    )
    rows = [(i, base) for i in range(8)]
    rows += [(8 + v, base + f" trailing variant token {v}") for v in range(3)]
    rows += [
        (11 + j, f"standalone text {j} full of unrelated vocabulary "
                 f"such as nimbus{j} parallax{j} crucible{j}")
        for j in range(4)
    ]
    df = local_df(spark, rows, "doc_id long, text string")
    store = SignatureStore(spark, str(tmp_path / "store"))
    with_store = P.corpus_dedup(
        df, "minhash", threshold=0.5, store=store, corpus="toy"
    )
    without = P.corpus_dedup(df, "minhash", threshold=0.5)
    assert _sorted_rows(with_store) == _sorted_rows(without)


def test_decontaminate_fuzzy_pipeline_matches_registered_shape(
    spark, docs, tmp_path
):
    store = SignatureStore(spark, str(tmp_path / "store"))
    is_eval = lambda c: c % 10 == 0  # noqa: E731 — the fixture's split
    via_store = P.decontaminate_fuzzy(
        docs, is_eval, threshold=0.12, max_bucket=None,
        store=store, corpus="docs",
    )
    # from-text, same params, no store
    via_text = P.decontaminate_fuzzy(
        docs, is_eval, threshold=0.12, max_bucket=None
    )
    assert _sorted_rows(via_store) == _sorted_rows(via_text)


def test_decontaminate_fuzzy_cross_reads_both_sides_from_artifacts(
    spark, docs, tmp_path
):
    """decontaminate_fuzzy_cross must (a) match the mixed-frame form
    pair-for-pair with caps off, (b) serve the eval suite from its own
    persisted artifacts — the second call passes None frames and every
    input file is a store parquet, no re-tokenize of either side."""
    store = SignatureStore(spark, str(tmp_path / "store"))
    eval_df = docs.filter(F.col("doc_id") % 10 == 0)
    train_df = docs.filter(F.col("doc_id") % 10 != 0)
    got = P.decontaminate_fuzzy_cross(
        train_df, eval_df, store, "train", "evalset",
        threshold=0.12, max_bucket=None,
    )
    want = P.decontaminate_fuzzy(
        docs, lambda c: c % 10 == 0, threshold=0.12, max_bucket=None
    )
    assert _sorted_rows(got) == _sorted_rows(want)
    # second call on the pre-built store: no frames needed, and both
    # sides' inputs are store artifacts (eval built ONCE, then a scan)
    again = P.decontaminate_fuzzy_cross(
        None, None, store, "train", "evalset",
        threshold=0.12, max_bucket=None,
    )
    assert _sorted_rows(again) == _sorted_rows(want)
    inputs = again.inputFiles()
    assert inputs and all(str(tmp_path / "store") in f for f in inputs)
    # capped form still runs (train-side-only cap) and stays a subset
    capped = P.decontaminate_fuzzy_cross(
        None, None, store, "train", "evalset", threshold=0.12,
    )
    got_rows = {r["doc_id"] for r in got.collect()}
    assert {r["doc_id"] for r in capped.collect()} <= got_rows


def test_cross_decontamination_fails_loud_on_revised_eval_suite(
    spark, docs, tmp_path
):
    """Artifacts are keyed by corpus name only, so a REVISED eval
    suite passed under the same name must raise (stale-artifact
    guard) instead of silently decontaminating against the old
    suite's signatures. The unchanged frame passes in any row order
    (the stamp is order-insensitive), None frames skip the check
    (explicit trust in the artifacts), and the first use STAMPS the
    corpus (builds its fingerprint artifact from the frame)."""
    store = SignatureStore(spark, str(tmp_path / "store"))
    eval_df = docs.filter(F.col("doc_id") % 10 == 0)
    train_df = docs.filter(F.col("doc_id") % 10 != 0)

    baseline = P.decontaminate_fuzzy_cross(
        train_df, eval_df, store, "train", "evalset",
        threshold=0.12, max_bucket=None,
    ).count()

    # the same suite re-passed (shuffled) still verifies
    P.decontaminate_fuzzy_cross(
        train_df, eval_df.orderBy(F.desc("doc_id")), store,
        "train", "evalset", threshold=0.12, max_bucket=None,
    )
    # and None frames keep working against the pre-built store
    assert P.decontaminate_fuzzy_cross(
        None, None, store, "train", "evalset",
        threshold=0.12, max_bucket=None,
    ).count() == baseline

    some_id = eval_df.select(F.min("doc_id")).first()[0]
    revised_text = eval_df.withColumn(
        "text",
        F.when(
            F.col("doc_id") == some_id, F.lit("a freshly revised question")
        ).otherwise(F.col("text")),
    )
    with pytest.raises(ValueError, match="stale"):
        P.decontaminate_fuzzy_cross(
            train_df, revised_text, store, "train", "evalset",
            threshold=0.12, max_bucket=None,
        )
    grown = eval_df.select("doc_id", "text").unionByName(
        local_df(
            spark, [(999999, "a brand new benchmark question")],
            "doc_id long, text string",
        ).select("doc_id", "text")
    )
    with pytest.raises(ValueError, match="stale"):
        P.decontaminate_fuzzy_cross(
            train_df, grown, store, "train", "evalset",
            threshold=0.12, max_bucket=None,
        )
    # direct store-level check too: assert_fresh is the reusable seam
    store.assert_fresh(eval_df, "evalset")
    with pytest.raises(ValueError, match="stale"):
        store.assert_fresh(revised_text, "evalset")


def test_assert_fresh_refuses_prefingerprint_store(spark, docs, tmp_path):
    """A corpus with postings/signatures but NO fingerprint table (a
    store built before assert_fresh existed, or a partial build) must
    not be silently stamped: fingerprints built from the frame in
    hand would certify possibly-revised content against artifacts
    computed from the OLD text, and the stale stamp would then match
    forever (r13 advice, medium). refresh_all is the sanctioned
    repair — it rebuilds every artifact from the frame, after which
    assert_fresh passes/fails on real content identity again."""
    store = SignatureStore(spark, str(tmp_path / "store"))
    eval_df = docs.filter(F.col("doc_id") % 10 == 0)
    store.postings(eval_df, "evalset")
    store.signatures(eval_df, "evalset")
    assert not store._is_complete(store.fingerprints_path("evalset"))

    # even the UNCHANGED frame raises: without the fingerprint
    # artifact, content identity with the postings is unprovable
    with pytest.raises(ValueError, match="no fingerprint"):
        store.assert_fresh(eval_df, "evalset")
    # and nothing was stamped by the failed check
    assert not store._is_complete(store.fingerprints_path("evalset"))

    revised = eval_df.withColumn(
        "text", F.concat(F.col("text"), F.lit(" revised"))
    )
    with pytest.raises(ValueError, match="no fingerprint"):
        store.assert_fresh(revised, "evalset")

    store.refresh_all(eval_df, "evalset")
    store.assert_fresh(eval_df, "evalset")  # one snapshot again
    with pytest.raises(ValueError, match="stale"):
        store.assert_fresh(revised, "evalset")


def test_content_stamp_detects_xor_cancelling_duplicate_pairs(spark):
    """count + bit-XOR alone is blind to frames differing by
    XOR-cancelling duplicate PAIRS — (A, A, C) vs (B, B, C) have
    equal counts and h^h == 0 on both sides, so the old stamp
    collided on genuinely different content. The decimal hash-SUM
    term separates them (2·h(A)+h(C) vs 2·h(B)+h(C)) while staying
    order-insensitive and ANSI-safe (r13 advice)."""
    a = local_df(
        spark,
        [("A", "fa"), ("A", "fa"), ("C", "fc")],
        "id string, fp string",
    )
    b = local_df(
        spark,
        [("B", "fb"), ("B", "fb"), ("C", "fc")],
        "id string, fp string",
    )
    sa = SignatureStore._content_stamp(a)
    sb = SignatureStore._content_stamp(b)
    # same count, same XOR — the sum term is what distinguishes them
    assert sa.split(":")[:2] == sb.split(":")[:2]
    assert sa != sb
    # order-insensitivity still holds
    assert SignatureStore._content_stamp(a.orderBy(F.desc("id"))) == sa


def test_store_guardrails(spark, docs, tmp_path):
    store = SignatureStore(spark, str(tmp_path / "store"))
    with pytest.raises(ValueError, match="minhash"):
        P.corpus_dedup(docs, "simhash", store=store, corpus="docs")
    with pytest.raises(ValueError, match="corpus"):
        P.corpus_dedup(docs, "minhash", store=store)
    with pytest.raises(ValueError, match="corpus"):
        P.decontaminate_fuzzy(docs, lambda c: c % 10 == 0, store=store)


def test_sizes_artifact_row_identical_and_delta_synced(spark, docs, docs_store):
    """(id, sz) must equal posts.groupBy(id).count() computed from
    scratch — base-only, and again after a delta commit (the commit
    rides the sizes delta along; ids stay disjoint across parts)."""
    store = docs_store
    from_store = store.sizes(docs, "docs")
    want = D.hashed_postings(docs, "doc_id", "text").groupBy("id").agg(
        F.count(F.lit(1)).alias("sz")
    )
    assert _sorted_rows(from_store) == _sorted_rows(want)
    # the artifact derives from the postings ARTIFACT, not the corpus
    inputs = store.sizes(None, "docs").inputFiles()
    assert inputs and all("doc_sizes" in f for f in inputs)

    batch = local_df(spark, 
        [(900001, "a wholly new document about glacier melt rates"),
         (900002, None)],
        "doc_id long, text string",
    )
    store.append_batch(batch, "docs", "b1")
    merged = store.sizes(None, "docs")
    base_n = want.count()
    # NULL text tokenizes to no shingles -> no postings row -> no size row
    assert merged.count() == base_n + 1
    assert merged.filter(F.col("id") == 900001).count() == 1
    # exclude_batch hides the delta (replay contract)
    assert store.sizes(None, "docs", exclude_batch="b1").count() == base_n


def test_band_census_artifact_matches_scratch_and_backfills(
    spark, docs, docs_store
):
    """(band, bh, cnt) must equal the census drop_hot_buckets would
    compute over the band-exploded signatures — base-only and after a
    commit; and a delta committed BEFORE the census artifact existed
    is backfilled from the signatures delta (_sync_deltas)."""
    store = docs_store
    batch = local_df(spark, 
        [(900001, "a wholly new document about glacier melt rates")],
        "doc_id long, text string",
    )
    # commit BEFORE the census artifact exists -> backfill path
    store.append_batch(batch, "docs", "b1")

    got = store.band_census(None, "docs")
    want = (
        D._banded_keys(store.signatures(None, "docs"), 64, 16)
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert _sorted_rows(got) == _sorted_rows(want)
    # the backfilled delta directory exists under the census tree
    droot = store._delta_root(store.band_census_path("docs"))
    assert store._is_complete(os.path.join(droot, "b1"))
    # excluding the batch reproduces the base-only census
    base_only = (
        D._banded_keys(
            spark.read.parquet(store.signatures_path("docs")), 64, 16
        )
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert _sorted_rows(
        store.band_census(None, "docs", exclude_batch="b1")
    ) == _sorted_rows(base_only)

    # a SECOND commit rides along (no backfill needed): delete nothing,
    # commit b2, census must include it immediately
    batch2 = local_df(spark, 
        [(900002, "another new document, este sobre ciclos de carbono")],
        "doc_id long, text string",
    )
    store.append_batch(batch2, "docs", "b2")
    assert store._is_complete(os.path.join(droot, "b2"))
    got2 = store.band_census(None, "docs")
    want2 = (
        D._banded_keys(store.signatures(None, "docs"), 64, 16)
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert _sorted_rows(got2) == _sorted_rows(want2)


def test_cross_pairs_with_artifact_aggregates_row_identical(
    spark, docs, tmp_path
):
    """minhash_lsh_pairs_cross(b_sizes=..., b_hot_buckets=...) must be
    row-identical to the self-computing path — same pairs, same
    jaccard, with and without a binding cap."""
    store = SignatureStore(spark, str(tmp_path / "store"))
    corpus = docs.limit(120)
    posts_b = store.postings(corpus, "c")
    sig_b = store.signatures(corpus, "c")
    sizes_b = store.sizes(corpus, "c")
    batch = corpus.limit(10).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    posts_a = D.hashed_postings(batch, "doc_id", "text")
    sig_a = D._signatures_from_hashed(posts_a, 64, 42)

    for cap in (None, 2):
        hot = (
            store.band_census(None, "c").filter(F.col("cnt") > cap)
            if cap is not None
            else None
        )
        fast = D.minhash_lsh_pairs_cross(
            posts_a, sig_a, posts_b, sig_b, threshold=0.3,
            max_band_bucket=cap, b_sizes=sizes_b, b_hot_buckets=hot,
        )
        slow = D.minhash_lsh_pairs_cross(
            posts_a, sig_a, posts_b, sig_b, threshold=0.3,
            max_band_bucket=cap,
        )
        assert _sorted_rows(fast) == _sorted_rows(slow), f"cap={cap}"


def test_compact_folds_deltas_row_identically(spark, docs, docs_store):
    """compact(): every artifact's post-compaction base must read
    row-identical to the pre-compaction base+deltas view, delta trees
    must be gone, and file counts bounded (DELTA_MAX_FILES per delta
    before; one base dir after)."""
    store = docs_store
    store.sizes(docs, "docs")
    store.band_census(docs, "docs")
    for i, txt in enumerate(
        ["glacier melt rates in the northern fjords",
         "carbon cycling of peat bogs across seasons"]
    ):
        store.append_batch(
            local_df(spark, 
                [(900001 + i, txt)], "doc_id long, text string"
            ),
            "docs",
            f"b{i}",
        )
    # per-delta file bound
    droot = store._delta_root(store.postings_path("docs"))
    files = glob.glob(os.path.join(droot, "b0", "*.parquet"))
    assert 1 <= len(files) <= SignatureStore.DELTA_MAX_FILES

    before = {
        "fps": _sorted_rows(store.fingerprints(None, "docs")),
        "posts": _sorted_rows(store.postings(None, "docs")),
        "sig": _sorted_rows(store.signatures(None, "docs")),
        "sz": _sorted_rows(store.sizes(None, "docs")),
        "census": _sorted_rows(store.band_census(None, "docs")),
    }
    assert store.compact("docs") == 2
    after = {
        "fps": _sorted_rows(store.fingerprints(None, "docs")),
        "posts": _sorted_rows(store.postings(None, "docs")),
        "sig": _sorted_rows(store.signatures(None, "docs")),
        "sz": _sorted_rows(store.sizes(None, "docs")),
        "census": _sorted_rows(store.band_census(None, "docs")),
    }
    assert before == after
    for path in (
        store.fingerprints_path("docs"),
        store.postings_path("docs"),
        store.signatures_path("docs"),
        store.sizes_path("docs"),
        store.band_census_path("docs"),
    ):
        assert store._delta_paths(path) == []
    # idempotent: nothing left to fold
    assert store.compact("docs") == 0


def test_compact_exclude_preserves_replayability(spark, docs, docs_store):
    """compact(exclude=current) must leave the excluded delta as a
    directory so an at-least-once replay of that batch can still hide
    it via exclude_batch — and must refuse (via _append_delta) to
    re-commit any FOLDED name, whose rows exclude_batch can no longer
    hide."""
    store = docs_store
    for i in range(3):
        store.append_batch(
            local_df(spark, 
                [(900001 + i, f"unique new document number {i} about "
                              f"topic{i} and subject{i}")],
                "doc_id long, text string",
            ),
            "docs",
            f"epoch-{i}",
        )
    total = store.fingerprints(None, "docs").count()
    assert store.compact("docs", exclude="epoch-2") == 2
    # folded epochs 0/1 are in the base; epoch-2 is still a live delta
    assert store._delta_paths(store.fingerprints_path("docs")) != []
    assert store.fingerprints(None, "docs").count() == total
    # the replay read still hides epoch-2 (exactly 1 row less)
    assert (
        store.fingerprints(None, "docs", exclude_batch="epoch-2").count()
        == total - 1
    )
    # ... but can NOT hide the folded epochs
    assert (
        store.fingerprints(None, "docs", exclude_batch="epoch-1").count()
        == total
    )
    # re-committing a folded name is refused loudly
    with pytest.raises(ValueError, match="folded"):
        store.append_batch(
            local_df(spark, 
                [(900099, "anything")], "doc_id long, text string"
            ),
            "docs",
            "epoch-1",
        )
    # re-committing the EXCLUDED (still-live) name stays legal: replace
    store.append_batch(
        local_df(spark, 
            [(900003, "unique new document number 2 about topic2 "
                      "and subject2")],
            "doc_id long, text string",
        ),
        "docs",
        "epoch-2",
    )
    assert store.fingerprints(None, "docs").count() == total


def test_compact_marker_makes_gc_crash_invisible(
    spark, docs, tmp_path, docs_store
):
    """A leftover delta directory whose name is in the _folded marker
    (GC crashed between base swap and delete) must be skipped by every
    read — no double count — and the next compact must GC it."""
    import shutil

    store = docs_store
    batch = local_df(spark, 
        [(900001, "a unique document about tidal marsh sediments")],
        "doc_id long, text string",
    )
    store.append_batch(batch, "docs", "b1")
    path = store.fingerprints_path("docs")
    d1 = os.path.join(store._delta_root(path), "b1")
    saved = str(tmp_path / "saved_b1")
    shutil.copytree(d1, saved)
    total = store.fingerprints(None, "docs").count()

    assert store.compact("docs") == 1
    # simulate the GC crash: the folded dir reappears
    shutil.copytree(saved, d1)
    assert "b1" in store._folded_names(path)
    assert store._delta_paths(path) == []  # marker hides it
    assert store.fingerprints(None, "docs").count() == total  # no dup
    store.compact("docs")  # GC sweeps the leftover
    assert not os.path.exists(d1)


def test_compact_backfills_derived_before_folding_source(
    spark, docs, docs_store
):
    """A batch committed BEFORE the sizes artifact existed must
    survive compaction: compact syncs the derived deltas first, else
    folding the postings delta would destroy the only source the
    backfill can derive from."""
    store = docs_store
    store.append_batch(
        local_df(spark, 
            [(900001, "a unique document about alpine lichen growth")],
            "doc_id long, text string",
        ),
        "docs",
        "b1",
    )
    # derived artifacts materialize AFTER the commit...
    store.sizes(docs, "docs")
    store.band_census(docs, "docs")
    # ...wipe their b1 deltas to simulate "existed but not synced yet"
    import shutil

    for p in (store.sizes_path("docs"), store.band_census_path("docs")):
        shutil.rmtree(os.path.join(store._delta_root(p), "b1"),
                      ignore_errors=True)
    store.compact("docs")
    # the batch doc's size row survived the fold
    assert store.sizes(None, "docs").filter(
        F.col("id") == 900001
    ).count() == 1
    # and the census total equals a from-scratch census of the full
    # post-compaction signature base
    want = (
        D._banded_keys(store.signatures(None, "docs"), 64, 16)
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert _sorted_rows(store.band_census(None, "docs")) == _sorted_rows(want)


def test_refresh_all_rebuilds_consistent_snapshot(spark, docs, docs_store):
    """refresh_all must rebuild all five bases from the new frame and
    drop every delta — no artifact left seeing batch documents the
    others lost."""
    store = docs_store
    store.sizes(docs, "docs")
    store.band_census(docs, "docs")
    store.append_batch(
        local_df(spark, 
            [(900001, "a unique doc about kelp forest canopies")],
            "doc_id long, text string",
        ),
        "docs",
        "b1",
    )
    bigger = docs.select("doc_id", "text").unionByName(
        local_df(spark, 
            [(900001, "a unique doc about kelp forest canopies"),
             (900002, "another unique doc about abyssal vents")],
            "doc_id long, text string",
        )
    )
    store.refresh_all(bigger, "docs")
    n = bigger.count()
    assert store.fingerprints(None, "docs").count() == n
    assert store.signatures(None, "docs").count() == n  # all have text
    assert store.sizes(None, "docs").count() == n
    for p in (
        store.fingerprints_path("docs"),
        store.postings_path("docs"),
        store.signatures_path("docs"),
        store.sizes_path("docs"),
        store.band_census_path("docs"),
    ):
        assert store._delta_paths(p) == []
    # the refreshed snapshot accepts the old batch name again (no
    # folded marker, no delta)
    store.append_batch(
        local_df(spark, 
            [(900003, "yet another unique doc about brine pools")],
            "doc_id long, text string",
        ),
        "docs",
        "b1",
    )
    assert store.fingerprints(None, "docs").count() == n + 1


def test_refresh_all_covers_nondefault_shingle_variants(
    spark, docs, docs_store, tmp_path
):
    """r14 advice #3: a corpus holding NON-default shingle-artifact
    variants (n != 3, other k/seed, non-default census bands) must
    have them rebuilt by refresh_all too. Before this, only the
    parameter variant PASSED to refresh_all was rebuilt — stale
    non-default variants survived the repair while assert_fresh then
    passed on the fresh fingerprint stamp, partially re-opening the
    stale-stamp hole the guard closed."""
    store = docs_store
    # materialize non-default variants alongside the prebuilt defaults
    store.signatures(docs, "docs", n=2)  # n=2 postings + signatures
    store.sizes(docs, "docs", n=2)
    store.signatures(docs, "docs", num_hashes=32, seed=7)
    store.band_census(docs, "docs", num_hashes=32, seed=7, bands=8)
    n_old = docs.count()
    bigger = docs.select("doc_id", "text").unionByName(
        local_df(
            spark,
            [(900010, "a unique doc about hadal trench pressure")],
            "doc_id long, text string",
        )
    )
    store.refresh_all(bigger, "docs")  # default parameters only
    n = bigger.count()
    assert n == n_old + 1
    # every materialized variant reflects the refreshed snapshot
    assert store.signatures(None, "docs", n=2).count() == n
    assert store.sizes(None, "docs", n=2).count() == n
    assert store.signatures(None, "docs", num_hashes=32, seed=7).count() == n
    census = store.band_census(
        None, "docs", num_hashes=32, seed=7, bands=8
    )
    # one bucket entry per (doc, band): total count = n * bands
    assert census.agg(F.sum("cnt").alias("s")).first()["s"] == n * 8
    # and the rebuilt variants are row-identical to a fresh build
    # from the same frame (not merely count-equal)
    fresh = SignatureStore(spark, str(tmp_path / "fresh"))
    assert sorted(
        tuple(r) for r in store.signatures(None, "docs", n=2).collect()
    ) == sorted(
        tuple(r) for r in fresh.signatures(bigger, "f", n=2).collect()
    )
    # variant deltas are cleared like the defaults'
    for p in (
        store.signatures_path("docs", n=2),
        store.sizes_path("docs", n=2),
        store.signatures_path("docs", num_hashes=32, seed=7),
        store.band_census_path("docs", num_hashes=32, seed=7, bands=8),
    ):
        assert store._delta_paths(p) == []
    store.assert_fresh(bigger, "docs")  # stamp and store are one snapshot


def test_delta_paths_crash_suffix_semantics(spark, docs, docs_store):
    """r15 review finding: crash-state suffix dirs in a delta root
    must never read as live deltas in their own right (both
    previously did — each bears _SUCCESS, but the RENAME is the
    commit).
    - '<b>__staging' (fully written, swap never ran): never read —
      uncommitted rows must not surface past exclude_batch — and
      never folded under a name no replay would exclude.
    - '<b>__old' with the live dir PRESENT (post-swap stale
      parking): skipped; reading both would double-count the batch.
    - '<b>__old' with the live dir MISSING (mid-swap parked): stands
      in for the bare batch — still readable (durability), hidden by
      exclude_batch=<b> (replay correctness), folded by compact
      under the BARE name with the physical dir GC'd.
    - the suffixes are reserved: refused as batch names at commit.
    """
    store = docs_store
    fpath = store.fingerprints_path("docs")
    droot = store._delta_root(fpath)
    n0 = store.fingerprints(None, "docs").count()

    def one_row(i):
        return store.fingerprints(None, "docs").limit(1).select(
            F.lit(i).cast("long").alias("id"), "fp"
        )

    # committed baseline delta
    store._append_delta(one_row(900001), fpath, "b1")
    assert store._read(fpath).count() == n0 + 1

    # (a) staging leftover: fully written, never swapped — invisible
    one_row(900002).coalesce(1).write.parquet(
        os.path.join(droot, "b2__staging")
    )
    assert store._read(fpath).count() == n0 + 1
    # (b) post-swap stale parking: live dir + __old — counted ONCE
    store._append_delta(one_row(900003), fpath, "b3")
    shutil.copytree(
        os.path.join(droot, "b3"), os.path.join(droot, "b3__old")
    )
    assert store._read(fpath).count() == n0 + 2
    # (c) mid-swap parked: live missing, __old present — stands in
    # for the bare name: still read, hidden by exclude_batch=bare
    os.rename(os.path.join(droot, "b3"), os.path.join(droot, "b3__old2"))
    shutil.rmtree(os.path.join(droot, "b3__old"))
    os.rename(
        os.path.join(droot, "b3__old2"), os.path.join(droot, "b3__old")
    )
    assert store._read(fpath).count() == n0 + 2
    assert store._read(fpath, exclude_batch="b3").count() == n0 + 1

    # compact folds b1 + the parked b3 under BARE names, GC's the
    # physical dirs, and never touches the staging leftover
    assert store._compact_one(fpath) == 2
    assert store._folded_names(fpath) == {"b1", "b3"}
    assert not os.path.exists(os.path.join(droot, "b3__old"))
    assert os.path.exists(os.path.join(droot, "b2__staging"))
    assert store._read(fpath).count() == n0 + 2  # rows now in base
    # the folded bare name is no longer replayable
    with pytest.raises(ValueError, match="already folded"):
        store._append_delta(one_row(900003), fpath, "b3")

    # (b') a stale __old of a FOLDED name left by a crashed GC is
    # reclaimed by the next compact's sweep and never double-counts
    shutil.copytree(
        os.path.join(droot, "b2__staging"), os.path.join(droot, "b1__old")
    )
    assert store._read(fpath).count() == n0 + 2  # folded: skipped
    store._compact_one(fpath)  # sweep runs even with nothing to fold
    assert not os.path.exists(os.path.join(droot, "b1__old"))

    # (d) reserved suffixes refused at commit time, both commit paths
    for bad in ("x__old", "x__staging", "a/b", "_x", ".x"):
        with pytest.raises(ValueError, match="invalid batch name"):
            store._append_delta(one_row(900009), fpath, bad)


def test_ivf_set_active_is_lease_guarded(spark, docs, docs_store_dir):
    """r14 advice #2: ivf_rescale's exclude-authority guard resolves
    copy authority from the active marker ONCE, under the write
    lease, assuming it cannot move mid-run. ivf_set_active must
    therefore take the same lease: a concurrent flip would change
    exclude-epoch authority after the guard resolved it and the
    wrong copy could be swept. The lease is re-entrant, so the
    internal calls (first-build stamp, ivf_rescale's own bump) are
    unaffected — pinned by every passing rescale test."""
    from b3_analytics_engine_spark.signature_store import StoreLockedError

    a = SignatureStore(spark, docs_store_dir, owner="job-a")
    b = SignatureStore(spark, docs_store_dir, owner="job-b")
    with a.lock("docs"):
        with pytest.raises(StoreLockedError, match="write-locked"):
            b.ivf_set_active("docs", 8, 2)
        a.ivf_set_active("docs", 8, 2)  # holder unaffected (re-entrant)
    b.ivf_set_active("docs", 16, 3)  # released: B proceeds
    assert b.ivf_active("docs") == (16, 3)


def test_simhash_cross_matches_symmetric_on_split_corpus(spark, docs, tmp_path):
    """simhash_pairs_cross(A-sigs, B-sigs) must equal the symmetric
    operator's A×B cut on the union — same pairs, same hamming —
    with and without the corpus-side hot-chunk drop (census-fed path
    row-identical to the self-census path)."""
    store = SignatureStore(spark, str(tmp_path / "store"))
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    sig_a = D.simhash_signatures(half_a, "doc_id", "text")
    sig_b = store.simhash(half_b, "b")
    a_ids = {r["doc_id"] for r in half_a.select("doc_id").collect()}

    sym = D.simhash_pairs(docs, max_hamming=6)
    want = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        if r["id_a"] in a_ids
        else (r["id_b"], r["id_a"], r["hamming"])
        for r in sym.collect()
        if (r["id_a"] in a_ids) != (r["id_b"] in a_ids)
    )
    for hot in (
        None,
        store.simhash_census(None, "b").filter(F.col("cnt") > 3),
    ):
        got = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in D.simhash_pairs_cross(
                sig_a, sig_b, max_hamming=6,
                max_chunk_bucket=3 if hot is None else None,
                b_hot_buckets=hot,
            ).collect()
        )
        # with the cap binding at 3, some pairs may legitimately drop;
        # assert the two capped paths agree with each other instead
        if hot is None:
            capped_self = got
        else:
            assert got == capped_self
    # uncapped cross == the symmetric A×B cut exactly
    uncapped = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_pairs_cross(sig_a, sig_b, max_hamming=6).collect()
    )
    assert uncapped == want


def test_simhash_delta_ride_along_and_validate_gap(
    spark, docs, tmp_path, docs_simhash_store
):
    """A commit rides simhash (and its census) deltas along when the
    bases exist; exclude_batch hides them; and validate() flags the
    id-set gap when the simhash base was built only AFTER commits."""
    store = docs_simhash_store
    n0 = store.simhash(None, "docs").count()
    batch = local_df(spark, 
        [(900001, "a singular document about volcanic soil chemistry")],
        "doc_id long, text string",
    )
    store.append_batch(batch, "docs", "b1")
    assert store.simhash(None, "docs").count() == n0 + 1
    assert store.simhash(None, "docs", exclude_batch="b1").count() == n0
    # census total tracks the base+delta signature view
    want = (
        store.simhash_census(None, "docs")
        .agg(F.sum("cnt").alias("s"))
        .first()["s"]
    )
    assert want == (n0 + 1) * 4  # 4 chunks per signature
    assert store.validate("docs")["ok"]

    # second store: simhash base built AFTER the commit -> gap flagged
    store2 = SignatureStore(spark, str(tmp_path / "store2"))
    store2.fingerprints(docs, "docs")
    store2.signatures(docs, "docs")
    store2.append_batch(batch, "docs", "b1")
    store2.simhash(docs, "docs")  # from the ORIGINAL frame: misses b1
    report = store2.validate("docs")
    assert not report["ok"]
    assert any("simhash" in e for e in report["errors"])


def test_validate_warns_on_legacy_reserved_suffix_delta(spark, docs_store):
    """r15 advice #3: _validate_batch_name now reserves the
    '__old'/'__staging' suffixes, but a store written BEFORE the
    reservation can hold a committed batch literally named 'x__old' —
    _delta_paths silently reinterprets it as swap parking (skipped
    when 'x' exists, folded under the bare name) instead of reading it
    as its own batch. validate() must surface such dirs as a WARNING
    (not a failure: a genuine crash leftover has the same on-disk
    shape, and only the operator can tell which)."""
    store = docs_store
    store.append_batch(
        local_df(
            spark,
            [(900001, "a singular document about volcanic soil chemistry")],
            "doc_id long, text string",
        ),
        "docs",
        "b1",
    )
    rep = store.validate("docs")
    assert rep["ok"] and rep["warnings"] == []
    # commits can no longer produce a reserved-suffix name, so forge
    # the pre-reservation state with a raw rename (no bare 'b1x' twin:
    # the dir now reads as a parked stand-in for batch 'b1x')
    for apath in (
        store.postings_path("docs"),
        store.signatures_path("docs"),
        store.fingerprints_path("docs"),
    ):
        droot = store._delta_root(apath)
        os.rename(
            os.path.join(droot, "b1"), os.path.join(droot, "b1x__old")
        )
    rep = store.validate("docs")
    assert rep["ok"]  # rows unchanged — consistency checks stay green
    assert any(
        "b1x__old" in w and "reserved" in w for w in rep["warnings"]
    )
    # an uncommitted staging leftover (no _SUCCESS) is NOT flagged —
    # it is invisible to readers and GC'd by the next swap
    sdroot = store._delta_root(store.postings_path("docs"))
    os.makedirs(os.path.join(sdroot, "b2__staging"))
    rep2 = store.validate("docs")
    assert not any("b2__staging" in w for w in rep2["warnings"])


def test_lazy_getter_recovers_parked_base_instead_of_rebuilding(
    spark, docs, docs_store
):
    """r16 crash-fuzz follow-up: an artifact base parked at
    '<path>__old' by a crashed maintenance swap (compact killed
    between replace_directory's two renames) must be RECOVERED by the
    next lazy read, not rebuilt — _write_atomic clears the delta
    tree, so a rebuild from the caller's corpus frame would silently
    DROP every committed delta batch's rows."""
    store = docs_store
    batch = local_df(
        spark,
        [(900001, "a singular document about volcanic soil chemistry")],
        "doc_id long, text string",
    )
    store.append_batch(batch, "docs", "b1")
    before = _sorted_rows(store.postings(None, "docs"))
    assert any(r[0] == 900001 for r in before)  # delta rows visible
    # park the base exactly as a mid-swap crash does
    ppath = store.postings_path("docs")
    os.rename(ppath, ppath + "__old")
    # a pipeline read that passes the ORIGINAL corpus frame (no batch
    # rows) — pre-fix this rebuilt the base from it and cleared b1
    after = _sorted_rows(store.postings(docs, "docs"))
    assert after == before
    assert not os.path.exists(ppath + "__old")
    assert [
        d.rsplit("/", 1)[-1] for d in store._delta_paths(ppath)
    ] == ["b1"]
    # refresh=True still means rebuild-from-frame (clears deltas by
    # design), parked or not
    os.rename(ppath, ppath + "__old")
    rebuilt = _sorted_rows(store.postings(docs, "docs", refresh=True))
    assert not any(r[0] == 900001 for r in rebuilt)
    assert store._delta_paths(ppath) == []


def test_compact_folds_simhash_family(spark, docs, docs_simhash_store):
    """compact() folds simhash + simhash-census deltas like the
    MinHash family: reads identical, delta trees cleared, census
    re-aggregated."""
    store = docs_simhash_store
    store.append_batch(
        local_df(spark, 
            [(900001, "a singular document about volcanic soil chemistry")],
            "doc_id long, text string",
        ),
        "docs",
        "b1",
    )
    before_sig = _sorted_rows(store.simhash(None, "docs"))
    before_census = _sorted_rows(store.simhash_census(None, "docs"))
    assert store.compact("docs") >= 1
    assert _sorted_rows(store.simhash(None, "docs")) == before_sig
    assert _sorted_rows(store.simhash_census(None, "docs")) == before_census
    for p in (
        store.simhash_path("docs"),
        store.simhash_census_path("docs"),
    ):
        assert store._delta_paths(p) == []
    assert store.validate("docs")["ok"]


def test_refresh_all_includes_simhash_family(
    spark, docs, tmp_path, docs_simhash_store
):
    """refresh_all must refresh an EXISTING simhash base (and census)
    to the new corpus frame — an un-refreshed simhash artifact would
    silently keep the old corpus view while every shingle-derived
    artifact moved on, skewing simhash_pairs_cross consumers."""
    store = docs_simhash_store
    store.append_batch(
        local_df(spark, 
            [(900001, "a unique doc about kelp forest canopies")],
            "doc_id long, text string",
        ),
        "docs",
        "b1",
    )
    bigger = docs.select("doc_id", "text").unionByName(
        local_df(spark, 
            [(900001, "a unique doc about kelp forest canopies"),
             (900002, "another unique doc about abyssal vents")],
            "doc_id long, text string",
        )
    )
    store.refresh_all(bigger, "docs")
    n = bigger.count()
    assert store.simhash(None, "docs").count() == n
    # census re-derived from the refreshed signature base
    total = (
        store.simhash_census(None, "docs")
        .agg(F.sum("cnt").alias("s"))
        .first()["s"]
    )
    assert total == n * 4
    for p in (
        store.simhash_path("docs"),
        store.simhash_census_path("docs"),
    ):
        assert store._delta_paths(p) == []
    assert store.validate("docs")["ok"]
    # a corpus that never built simhash still refreshes cleanly
    store2 = SignatureStore(spark, str(tmp_path / "store2"))
    store2.fingerprints(docs, "docs")
    store2.signatures(docs, "docs")
    store2.refresh_all(bigger, "docs")
    assert not store2._is_complete(store2.simhash_path("docs"))


def test_refresh_all_and_compact_cover_nondefault_simhash_nbits(
    spark, docs, tmp_path
):
    """The simhash family is maintained by DISCOVERY, not by assuming
    the nbits=64 default: a corpus whose simhash was built at nbits=32
    must still be refreshed by refresh_all and watched/folded by
    maybe_compact/compact (r11 advice — the old hardcoded 64 silently
    kept a stale 32-bit base through both)."""
    store = SignatureStore(spark, str(tmp_path / "store"))
    d = docs.select("doc_id", "text").limit(30)
    store.fingerprints(d, "docs")
    store.signatures(d, "docs")
    store.simhash(d, "docs", nbits=32)
    assert store._simhash_variants("docs") == [(32, False)]
    extra = local_df(spark, 
        [(910001, "a fresh doc about tidal marsh sediment")],
        "doc_id long, text string",
    )
    store.append_batch(extra, "docs", "b1")
    bigger = d.unionByName(extra)
    store.refresh_all(bigger, "docs")
    n = bigger.count()
    assert store.simhash(None, "docs", nbits=32).count() == n
    # compact folds the 32-bit family's deltas too
    store.append_batch(
        local_df(spark, 
            [(910002, "another fresh doc about glacial till")],
            "doc_id long, text string",
        ),
        "docs",
        "b2",
    )
    assert store._delta_paths(store.simhash_path("docs", 32)) != []
    store.compact("docs")
    assert store._delta_paths(store.simhash_path("docs", 32)) == []
    assert store.simhash(None, "docs", nbits=32).count() == n + 1


def test_folded_ledger_survives_later_compactions(spark, docs, docs_store):
    """The _folded marker set must be a persistent ledger: a batch
    folded TWO compactions ago is still refused on re-commit — without
    carry-forward, the second compact's fresh base would only marker
    the newly folded names and a b0 replay would double-count."""
    store = docs_store

    def _commit(name, txt):
        store.append_batch(
            local_df(spark, 
                [(hash(name) % 1000 + 900001, txt)],
                "doc_id long, text string",
            ),
            "docs",
            name,
        )

    _commit("b0", "glacier melt rates in the northern fjords")
    assert store.compact("docs") == 1          # folds b0
    _commit("b1", "carbon cycling of peat bogs across seasons")
    assert store.compact("docs") == 1          # folds b1 — new base
    # b0's folded-ness must have ridden into the b1-compaction base
    assert store._folded_names(store.fingerprints_path("docs")) >= {"b0", "b1"}
    for name in ("b0", "b1"):
        with pytest.raises(ValueError, match="folded"):
            _commit(name, "replay attempt")
    # reads stay clean and artifacts consistent
    assert store.validate("docs")["ok"]
    # a base refresh legitimately resets replay history
    store.refresh_all(docs.select("doc_id", "text"), "docs")
    _commit("b0", "glacier melt rates in the northern fjords")
    assert store.validate("docs")["ok"]


# ------------------------------------------------- write lease


def test_second_writer_fails_loudly_append_vs_compact(
    spark, docs, docs_store_dir
):
    """Two independent stores (distinct owners) on the same root: while
    writer A holds the corpus lease (append racing compact and
    append racing append), writer B's mutators raise StoreLockedError
    instead of interleaving; afterwards B proceeds and the artifacts
    fsck green."""
    from b3_analytics_engine_spark.signature_store import StoreLockedError

    root = docs_store_dir
    a = SignatureStore(spark, root, owner="job-a")
    b = SignatureStore(spark, root, owner="job-b")
    batch = local_df(spark, 
        [(900001, "a unique doc about kelp forest canopies")],
        "doc_id long, text string",
    )
    with a.lock("docs"):  # A mid-append / mid-compact
        # append racing compact
        with pytest.raises(StoreLockedError, match="write-locked"):
            b.compact("docs")
        # append racing append
        with pytest.raises(StoreLockedError, match="write-locked"):
            b.append_batch(batch, "docs", "b1")
        # A itself is unaffected (reentrant lease)
        a.append_batch(batch, "docs", "b1")
    # lease released: B can now mutate, and the store is consistent
    assert b.compact("docs") == 1
    assert b.validate("docs")["ok"]



class S3ConditionalPutLeaseFake:
    """In-memory stand-in for an object store with conditional PUT
    (``If-None-Match: *``) — the backend the lease seam exists for.
    Semantics emulated: creates are atomic compare-and-set under the
    service's internal serialization; GET and DELETE are strongly
    consistent; but the FIRST read after a create serves the lagging
    edge (returns None once, the absent-or-half-written answer a
    replica still converging on a fresh PUT gives) — exactly the
    contended-or-racing case the protocol's retry-once documents.
    There is deliberately NO listing operation: the protocol must
    never need one (object-store LIST is the weakest-consistency
    surface)."""

    def __init__(self):
        import threading

        self._mu = threading.Lock()
        self._obj: dict[str, str] = {}
        self._lagged: dict[str, bool] = {}

    def try_create(self, lock_path, owner):
        with self._mu:
            if lock_path in self._obj:
                return False
            self._obj[lock_path] = owner
            self._lagged[lock_path] = True
            return True

    def read_owner(self, lock_path):
        with self._mu:
            if lock_path not in self._obj:
                return None
            if self._lagged.pop(lock_path, False):
                return None  # lagging replica / half-written stamp
            return self._obj[lock_path]

    def delete(self, lock_path):
        with self._mu:
            self._obj.pop(lock_path, None)
            self._lagged.pop(lock_path, None)


@pytest.fixture(params=["hadoop", "s3put"])
def lease_mk(request, spark):
    """Store factory over the lease backend under test: the default
    Hadoop atomic-create backend, or the S3 conditional-PUT fake —
    ONE fake instance shared by every store the test builds, like the
    real service would be. The contend/adopt/release and 8-thread
    race tests run against BOTH, proving the protocol is
    backend-agnostic beyond the dict stand-in."""
    if request.param == "hadoop":
        return lambda root, owner=None: SignatureStore(
            spark, root, owner=owner
        )
    svc = S3ConditionalPutLeaseFake()
    return lambda root, owner=None: SignatureStore(
        spark, root, owner=owner, lease_backend=svc
    )


def test_lease_adoption_is_the_crash_recovery_path(
    spark, docs, docs_store_dir, lease_mk
):
    """A crashed writer leaves its lease behind. A restart with the
    SAME stable owner adopts it and replays; any other owner is
    refused until break_lock."""
    from b3_analytics_engine_spark.signature_store import StoreLockedError

    root = docs_store_dir
    a = lease_mk(root, owner="stream-ckpt-7")
    a._acquire("docs")  # crash: lease never released

    stranger = lease_mk(root)  # random owner
    with pytest.raises(StoreLockedError, match="stream-ckpt-7"):
        stranger.compact("docs")

    restarted = lease_mk(root, owner="stream-ckpt-7")
    restarted.append_batch(  # adopts the stale lease and replays
        local_df(spark, 
            [(900001, "a unique doc about kelp forest canopies")],
            "doc_id long, text string",
        ),
        "docs",
        "b1",
    )
    # the replayed mutation completed -> lease released with it
    assert restarted._lock_owner("docs") is None
    assert stranger.compact("docs") == 1

    # break_lock is the override when the dead holder will NOT replay
    a._acquire("docs")  # crash again
    with pytest.raises(StoreLockedError, match="stream-ckpt-7"):
        stranger.refresh_all(docs.select("doc_id", "text"), "docs")
    stranger.break_lock("docs")
    stranger.refresh_all(docs.select("doc_id", "text"), "docs")
    assert stranger.validate("docs")["ok"]


def test_lease_released_after_normal_mutation(
    spark, docs, docs_store_dir, lease_mk
):
    """Every mutating entry point releases the lease on exit (success
    AND failure), so sequential writers with different owners never
    block each other."""
    from b3_analytics_engine_spark.signature_store import StoreLockedError

    root = docs_store_dir
    a = lease_mk(root, owner="x")
    b = lease_mk(root, owner="y")
    batch = local_df(spark, 
        [(900001, "a unique doc about kelp forest canopies")],
        "doc_id long, text string",
    )
    a.append_batch(batch, "docs", "b1")
    assert a._lock_owner("docs") is None
    b.compact("docs")
    assert b._lock_owner("docs") is None
    # a failing mutator also releases: folded-name replay refusal
    with pytest.raises(ValueError, match="folded"):
        a.append_batch(batch, "docs", "b1")
    assert a._lock_owner("docs") is None
    b.refresh_all(docs.select("doc_id", "text"), "docs")
    assert b._lock_owner("docs") is None


def test_first_build_is_lease_guarded_double_checked(spark, docs, tmp_path):
    """Two jobs racing the same FIRST build must not collide on the
    staging directory: while writer A holds the lease, writer B's
    first-build (and derived backfill) fails loudly; after release B
    re-checks and reads the artifact A published instead of
    rebuilding. Pure reads of complete artifacts never touch the
    lease."""
    from b3_analytics_engine_spark.signature_store import StoreLockedError

    root = str(tmp_path / "store")
    a = SignatureStore(spark, root, owner="a")
    b = SignatureStore(spark, root, owner="b")
    with a.lock("docs"):
        with pytest.raises(StoreLockedError):
            b.postings(docs, "docs")
        a.fingerprints(docs, "docs")  # A builds under its own lease
        a.signatures(docs, "docs")
    # B's build branch re-checks under the lease: artifact complete ->
    # no rebuild (pinned by file mtimes staying put)
    import glob as _glob
    import os as _os

    files_before = {
        f: _os.path.getmtime(f)
        for f in _glob.glob(_os.path.join(root, "hashed_postings", "**", "*.parquet"),
                            recursive=True)
    }
    assert b.postings(docs, "docs").count() > 0
    files_after = {
        f: _os.path.getmtime(f)
        for f in _glob.glob(_os.path.join(root, "hashed_postings", "**", "*.parquet"),
                            recursive=True)
    }
    assert files_before == files_after
    # a pure read with the lease HELD by someone else still works
    with a.lock("docs"):
        assert b.signatures(None, "docs").count() > 0
    # derived backfill on the read path is also lease-guarded
    a.append_batch(
        local_df(spark, 
            [(900001, "a unique doc about kelp forest canopies")],
            "doc_id long, text string",
        ),
        "docs", "b1",
    )
    a.sizes(docs, "docs")  # creates sizes base + backfills b1 delta
    with a.lock("docs"):
        # b's sizes() read needs no backfill -> lock-free, works
        assert b.sizes(None, "docs").count() > 0
    assert a.validate("docs")["ok"]


def test_bystander_read_of_midswap_parked_base(spark, docs, docs_store_dir):
    """The bystander-read contract for a base parked at ``__old`` by a
    crashed maintenance swap (compact killed between
    ``replace_directory``'s two renames, lease left held): a
    DIFFERENT-owner read that needs the recovery refuses loudly with
    the holder's name — torn state is never served and never rebuilt
    over — and once the dead holder's lease is broken, ANY owner's
    read recovers the parked base under the lease and serves
    base + committed deltas unchanged."""
    from b3_analytics_engine_spark.signature_store import StoreLockedError

    root = docs_store_dir
    maint = SignatureStore(spark, root, owner="maint")
    maint.append_batch(
        local_df(spark,
            [(900001, "a unique doc about kelp forest canopies")],
            "doc_id long, text string",
        ),
        "docs", "b1",
    )
    expect = sorted(tuple(r) for r in maint.postings(None, "docs").collect())
    # simulate the crash: base parked, live dir missing, lease held
    ppath = maint.postings_path("docs")
    os.rename(ppath, ppath + "__old")
    maint._acquire("docs")

    reader = SignatureStore(spark, root, owner="bystander")
    with pytest.raises(StoreLockedError, match="maint"):
        reader.postings(docs, "docs")
    assert not os.path.exists(ppath)  # refused WITHOUT touching state

    reader.break_lock("docs")  # the holder is known dead
    got = sorted(tuple(r) for r in reader.postings(None, "docs").collect())
    assert got == expect
    assert not os.path.exists(ppath + "__old")
    assert reader.validate("docs")["ok"]
    assert reader._lock_owner("docs") is None  # recovery lease released


def test_append_batch_recovers_parked_base_precondition(
    spark, docs_store_dir
):
    """append_batch arriving after a sibling maintenance op crashed
    mid-swap (base parked at ``__old``, live dir missing) must
    recover the base and commit — not refuse with the dead-end
    "no base artifact; build the snapshot first". The streaming
    ingest's compact_every path makes that ordering routine."""
    root = docs_store_dir
    s = SignatureStore(spark, root, owner="m")
    fp = s.fingerprints_path("docs")
    os.rename(fp, fp + "__old")

    batch = local_df(spark,
        [(900001, "a unique doc about kelp forest canopies")],
        "doc_id long, text string",
    )
    s.append_batch(batch, "docs", "b1")  # must not raise
    assert not os.path.exists(fp + "__old")
    assert any(
        r["id"] == 900001 for r in s.fingerprints(None, "docs").collect()
    )
    assert s.validate("docs")["ok"]


def test_assert_fresh_recovers_parked_fingerprints(spark, docs, docs_store_dir):
    """assert_fresh on a store whose fingerprint base was parked by a
    crashed maintenance swap must recover it and verify — not misread
    the crash as "store predates fingerprints" and demand a
    refresh_all."""
    root = docs_store_dir
    s = SignatureStore(spark, root, owner="m")
    fp = s.fingerprints_path("docs")
    os.rename(fp, fp + "__old")
    s.assert_fresh(docs.select("doc_id", "text"), "docs")  # must not raise
    assert not os.path.exists(fp + "__old")


def test_maybe_compact_triggers_on_delta_count(spark, docs, docs_store):
    """maybe_compact is the self-scheduling compaction: a no-op (and
    lease-free) under the threshold, a full fold above it, honoring
    exclude= for the current epoch."""
    store = docs_store
    for i in range(3):
        store.append_batch(
            local_df(spark, 
                [(900001 + i, f"distinct doc number {i} about topic {i}")],
                "doc_id long, text string",
            ),
            "docs",
            f"b{i}",
        )
    # under threshold: no fold, even while someone else holds the lease
    other = SignatureStore(spark, store.root, owner="other")
    with other.lock("docs"):
        assert store.maybe_compact("docs", max_deltas=3) == 0
    # above threshold: folds everything but the excluded epoch
    assert store.maybe_compact("docs", max_deltas=1, exclude="b2") == 2
    live = [
        p.rsplit("/", 1)[-1]
        for p in store._delta_paths(store.fingerprints_path("docs"))
    ]
    assert live == ["b2"]
    assert store.validate("docs")["ok"]


def test_lease_admits_one_writer_under_thread_race(
    spark, docs_store_dir, lease_mk
):
    """Eight threads race append_batch on the SAME corpus with
    distinct owners and distinct batch names. The kernel-level
    O_CREAT|O_EXCL create admits one holder at a time (Hadoop's local
    create(overwrite=false) is check-then-act, which two racers can
    both pass), so every attempt either commits fully or raises
    StoreLockedError — never interleaves. Afterwards the committed
    batches are each present exactly once and the store fscks green."""
    from concurrent.futures import ThreadPoolExecutor

    from b3_analytics_engine_spark.signature_store import StoreLockedError

    def attempt(i):
        s = lease_mk(docs_store_dir, owner=f"racer-{i}")
        text = " ".join(f"racer{i}token{k}" for k in range(10))
        batch = local_df(spark, 
            [(910000 + i, text)], "doc_id long, text string"
        )
        try:
            s.append_batch(batch, "docs", f"race-{i}")
            return ("ok", i)
        except StoreLockedError:
            return ("locked", i)

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(attempt, range(8)))

    ok = sorted(i for st, i in results if st == "ok")
    assert ok, "every racer lost — the lease never admitted anyone"
    store = SignatureStore(spark, docs_store_dir)
    ids = [
        r["id"]
        for r in store.fingerprints(None, "docs").select("id").collect()
    ]
    assert len(ids) == len(set(ids)), "a racing append double-committed"
    assert {i for i in ids if i >= 910000} == {910000 + i for i in ok}
    assert store.validate("docs")["ok"]


def test_lease_backend_seam(spark, docs, tmp_path):
    """Lease acquisition is pluggable: a backend implementing
    try_create/read_owner/delete (the shape an S3 conditional-put
    backend would take) is honored by every mutating entry point —
    a second store sharing the backend is refused while the first
    holds, admitted after release, and a same-owner store adopts."""
    from b3_analytics_engine_spark.signature_store import StoreLockedError

    class DictLeaseBackend:
        # in-memory stand-in for a conditional-put service
        def __init__(self):
            self.locks = {}
            self.creates = 0

        def try_create(self, lock_path, owner):
            if lock_path in self.locks:
                return False
            self.locks[lock_path] = owner
            self.creates += 1
            return True

        def read_owner(self, lock_path):
            return self.locks.get(lock_path)

        def delete(self, lock_path):
            self.locks.pop(lock_path, None)

    backend = DictLeaseBackend()
    root = str(tmp_path / "store")
    s1 = SignatureStore(spark, root, owner="job-a", lease_backend=backend)
    d = docs.select("doc_id", "text").limit(20)
    with s1.lock("docs"):
        assert backend.creates == 1 and backend.read_owner(
            s1._lock_file("docs")
        ) == "job-a"
        s2 = SignatureStore(
            spark, root, owner="job-b", lease_backend=backend
        )
        with pytest.raises(StoreLockedError, match="job-a"):
            with s2.lock("docs"):
                pass
        # same-owner adoption (crash recovery) goes through the seam
        s1_twin = SignatureStore(
            spark, root, owner="job-a", lease_backend=backend
        )
        with s1_twin.lock("docs"):
            pass  # adopt, not create
        assert backend.creates == 1
    assert backend.read_owner(s1._lock_file("docs")) is None  # released
    # a real mutation under the custom backend
    s1.fingerprints(d, "docs")
    assert backend.creates == 2 and not backend.locks
