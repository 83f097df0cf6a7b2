"""End-to-end pipeline compositions (SURVEY.md §3 E1/E3) — thin
orchestration over the operator library, replacing the reference's
Airflow DAGs.

E2 (the incremental micro-batch pipeline) lives in
``streaming/pipeline.py``.

The LLM-corpus near-dup pipeline entry points (``neardup_pairs``,
``corpus_dedup``) live here too, with the hot-bucket caps ACTIVE BY
DEFAULT — the scale-safety posture a production run wants. The
registered oracle queries keep calling the operators directly with
caps=None so their DuckDB parity stays bit-exact; this layer is what
a 100 TB corpus run calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.aggregates import corr_matrix, distinct_sorted, top_k_global
from .operators.joins import latest_per_key, pivot_wide
from .operators.rowops import (
    drop_null,
    numeric_cast_coerce,
    parse_timestamp,
    to_sao_paulo,
)
from .operators.windows import cumulative_return, pct_change
from .sinks.files import write_parquet_lake
from .sources.files import read_cotahist_csv

COTAHIST_NUMERIC = ["PREABE", "PREMAX", "PREMIN", "PREULT", "QUATOT", "VOLTOT"]


def historical_load(
    spark: SparkSession, csv_path: str, out_path: str | None = None
) -> DataFrame:
    """E1: COTAHIST CSV → filtered/typed frame → date-keyed Parquet
    lake (reference include/tasks/batch_ingestion.py:7-58). One
    declarative chain — Catalyst pushes the CODBDI filter and prunes
    columns into the CSV scan."""
    df = read_cotahist_csv(spark, csv_path)
    df = df.filter(F.col("CODBDI") == 2)  # P1: lot-market rows only
    df = numeric_cast_coerce(df, COTAHIST_NUMERIC)  # P5
    df = drop_null(df, COTAHIST_NUMERIC)  # P7
    df = parse_timestamp(df, "DATPRE", "yyyy-MM-dd")  # P6
    if out_path is not None:
        write_parquet_lake(df, out_path, date_col="DATPRE", mode="overwrite")
    return df


def daily_returns(warehouse: DataFrame) -> DataFrame:
    """E3 report stage 1 (reference include/tasks/generate_dashboard.py:25-36):
    per-symbol daily % change and cumulative compounded return."""
    df = pct_change(warehouse, "close", "symbol", "date", "daily_return")
    return cumulative_return(df, "daily_return", "symbol", "date", "cumulative_return")


def returns_correlation(warehouse: DataFrame, symbols: list[str]) -> DataFrame:
    """E3 report stage 2: pivot daily returns wide (J4) and compute the
    pairwise Pearson matrix (A5) in one aggregation pass."""
    rets = daily_returns(warehouse).select("symbol", "date", "daily_return")
    wide = pivot_wide(rets, "date", "symbol", "daily_return", symbols)
    return corr_matrix(wide, symbols, round_to=6)


def dashboard_frames(warehouse: DataFrame) -> dict[str, DataFrame]:
    """E3 dashboard queries (reference analytics_service/dashboard.py:58-176)
    — each chart/tile's backing frame as a small query result:

    - symbols: distinct sorted keys (A4)
    - latest: latest row per symbol, with São Paulo wall time (A2, P11)
    - top_volume / largest_move / max_amplitude: top-1s (A3, P10, P12)
    - cap_share: market-cap percent-of-total (A7)
    """
    latest = latest_per_key(warehouse, "symbol", "date").withColumn(
        "date_local", to_sao_paulo("date")
    )
    with_move = warehouse.withColumn("abs_change", F.abs(F.col("change_day")))
    with_amp = warehouse.withColumn("amplitude", F.col("high") - F.col("low"))
    total_cap = latest.agg(F.sum("marketCap").alias("total"))
    cap_share = latest.crossJoin(F.broadcast(total_cap)).select(
        "symbol",
        "marketCap",
        F.round(
            F.try_divide(F.lit(100.0) * F.col("marketCap"), F.col("total")), 6
        ).alias("cap_pct"),
    )
    return {
        "symbols": distinct_sorted(warehouse, "symbol"),
        "latest": latest,
        "top_volume": top_k_global(warehouse, F.col("volume")),
        "largest_move": top_k_global(with_move, F.col("abs_change")),
        "max_amplitude": top_k_global(with_amp, F.col("amplitude")),
        "cap_share": cap_share,
    }


# --------------------------------------------------------------------
# LLM-corpus near-dup pipeline (hot-bucket caps active by default)
# --------------------------------------------------------------------
#
# Cap defaults, and why these numbers: a bucket of B rows emits
# B(B-1)/2 self-join candidates inside ONE task. At 1024 that is
# ~524k candidate rows per hot bucket — a bounded, seconds-scale task
# on any executor — while buckets wider than that are, by
# construction, >=1024-member near-identical clusters that the exact
# tier (fingerprint groupBy / connected_components) already collapses
# for O(B) instead of O(B^2). RHP embedding buckets get a higher cap
# (4096) because hash tables there are narrower (2^bits buckets per
# table) and dense regions are more often genuinely diverse than
# textual boilerplate mega-clusters. Pass None explicitly to disable
# a cap (bit-exact oracle parity, quadratic risk accepted).
DEFAULT_MAX_BAND_BUCKET = 1024  # minhash LSH (band, band-hash) buckets
DEFAULT_MAX_CHUNK_BUCKET = 1024  # simhash (chunk, chunk-value) buckets
DEFAULT_MAX_RHP_BUCKET = 4096  # embedding RHP (table, bucket) buckets


def neardup_pairs(
    df: DataFrame,
    method: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    max_hamming: int = 3,
    max_bucket: int | None = -1,
    posts: DataFrame | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs for a corpus — the pipeline
    entry point over the three banding families, with the hot-bucket
    cap ON by default (``max_bucket=-1`` = the family's documented
    default; ``None`` disables; any positive int overrides).

    Returns (id_a, id_b, score) where score is jaccard / hamming /
    cos_sim depending on ``method`` ∈ {minhash, simhash, embedding}.

    ``posts`` / ``sig``: precomputed postings / signature frames
    (``SignatureStore`` artifacts) — minhash only; the other families
    derive nothing from the shingle index.
    """
    from .operators import dedup as D
    from .operators import similarity as S

    if posts is not None and method != "minhash":
        raise ValueError("posts/sig reuse applies to method='minhash' only")
    if method == "minhash":
        cap = DEFAULT_MAX_BAND_BUCKET if max_bucket == -1 else max_bucket
        return D.minhash_lsh_pairs(
            df, id_col, text_col, threshold=threshold, max_band_bucket=cap,
            posts=posts, sig=sig,
        )
    if method == "simhash":
        cap = DEFAULT_MAX_CHUNK_BUCKET if max_bucket == -1 else max_bucket
        return D.simhash_pairs(
            df, id_col, text_col, max_hamming=max_hamming, max_chunk_bucket=cap
        )
    if method == "embedding":
        cap = DEFAULT_MAX_RHP_BUCKET if max_bucket == -1 else max_bucket
        return S.embedding_neardup_pairs(
            df, threshold=threshold, id_col=id_col, vec_col=vec_col,
            max_bucket=cap,
        )
    raise ValueError(f"unknown near-dup method {method!r}")


def corpus_dedup(
    df: DataFrame,
    method: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_bucket: int | None = -1,
    store=None,
    corpus: str | None = None,
) -> DataFrame:
    """End-to-end corpus dedup: exact tier first, then near-dup pairs
    → connected components → keep each cluster's minimum id.

    Stage order is the cost argument: the exact tier (fingerprint
    groupBy, O(N), embarrassingly parallel) removes byte-identical
    copies BEFORE the near-dup tier ever runs, so mega-clusters of
    identical boilerplate never reach the banded self-join — the
    hot-bucket caps (on by default here) then only fire on
    near-identical-but-not-equal residue. Returns the surviving rows
    of ``df`` (all original columns).

    ``store`` + ``corpus`` (minhash only): a
    :class:`~.signature_store.SignatureStore` — the postings/signature
    artifacts for the FULL corpus are read through the store (computed
    and persisted on first use, Parquet-scanned after), then filtered
    to the exact tier's survivors with a left-semi join. Artifacts stay
    keyed by the full corpus so OTHER consumers (decontamination,
    clustering) reuse the same ones — at 100 TB the signature
    computation runs once per corpus snapshot, not once per pass.
    """
    from .operators import dedup as D
    from .operators.text import fingerprint

    # exact tier inlined rather than via exact_duplicates(): that
    # operator also aggregates sort_array(collect_list(id)) — the full
    # member roster per fingerprint — which this pipeline never reads.
    # At corpus scale the roster dominates the shuffle for mega-
    # clusters; min(id) is all the keep decision needs.
    from .operators.common import materialize

    # NULL text ⇒ NULL fingerprint, and groupBy treats NULL as a
    # regular key — so NULL-text rows get a PER-ROW synthetic
    # fingerprint ("null:<id>") instead: each is its own group and
    # passes through, rather than all collapsing into one bogus
    # "duplicate group" that drops every NULL doc but min(id). The
    # coalesce keeps the keep-set build at ONE corpus scan + one
    # shuffle (a filter/union split would read the corpus twice).
    fp = F.coalesce(
        fingerprint(text_col),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    )
    keep = (
        df.select(fp.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
        # `kept` (df ⋈ keep) is consumed by the near-dup tier AND the
        # final survivor anti-join — without this, each consumer
        # re-runs the full-corpus md5 fingerprint scan + groupBy that
        # produces the keep set. The frame itself is one id column.
        .transform(materialize)
    )
    kept = df.join(keep, id_col, "left_semi")
    posts = sig = None
    if store is not None:
        if method != "minhash":
            raise ValueError("signature-store reuse applies to minhash only")
        if corpus is None:
            raise ValueError("corpus name is required with a store")
        # full-corpus artifacts (reusable by other consumers), cut to
        # the exact tier's survivors; the semi-join pushes the keep set
        # into the artifact scan instead of re-tokenizing anything
        keep_ids = kept.select(F.col(id_col).alias("id"))
        posts = store.postings(df, corpus, id_col, text_col).join(
            keep_ids, "id", "left_semi"
        )
        sig = store.signatures(df, corpus, id_col, text_col).join(
            keep_ids, "id", "left_semi"
        )
    pairs = neardup_pairs(
        kept, method, id_col, text_col,
        threshold=threshold, max_bucket=max_bucket,
        posts=posts, sig=sig,
    )
    comp = D.connected_components(pairs)
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return kept.join(drop, id_col, "left_anti")


def decontaminate_fuzzy(
    df: DataFrame,
    is_eval,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.12,
    max_bucket: int | None = -1,
    store=None,
    corpus: str | None = None,
) -> DataFrame:
    """FUZZY train/eval decontamination — the production twin of the
    registered `decontaminate_fuzzy` query: training docs that
    NEAR-duplicate a held-out doc, via MinHash+LSH candidates with
    the cross-split cut pushed INSIDE the band join and the hot-bucket
    cap on by default.

    ``is_eval(id_column) -> Column``: boolean predicate marking
    held-out documents (e.g. ``lambda c: c % 10 == 0``, or a lookup
    against a broadcast eval-id set).

    ``store`` + ``corpus``: reuse the SAME full-corpus postings/
    signature artifacts `corpus_dedup` reads — the second consumer of
    a corpus snapshot pays a Parquet scan, not a re-tokenize (the
    whole point of :class:`~.signature_store.SignatureStore`).

    Returns (``id_col``, n_fuzzy_matches, max_jaccard) per
    contaminated TRAINING document.
    """
    from .operators import dedup as D

    cap = DEFAULT_MAX_BAND_BUCKET if max_bucket == -1 else max_bucket
    posts = sig = None
    if store is not None:
        if corpus is None:
            raise ValueError("corpus name is required with a store")
        posts = store.postings(df, corpus, id_col, text_col)
        sig = store.signatures(df, corpus, id_col, text_col)
    cross = D.minhash_lsh_pairs(
        df,
        id_col,
        text_col,
        threshold=threshold,
        pair_pred=lambda ia, ib: is_eval(ia) != is_eval(ib),
        max_band_bucket=cap,
        posts=posts,
        sig=sig,
    )
    contaminated = (
        F.when(~is_eval(F.col("id_a")), F.col("id_a")).otherwise(F.col("id_b"))
    )
    return (
        cross.select(contaminated.alias(id_col), "jaccard")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fuzzy_matches"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


def decontaminate_fuzzy_cross(
    train_df: DataFrame | None,
    eval_df: DataFrame | None,
    store,
    train_corpus: str,
    eval_corpus: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.12,
    max_bucket: int | None = -1,
) -> DataFrame:
    """Fuzzy decontamination with BOTH splits served from persisted
    :class:`~.signature_store.SignatureStore` artifacts — the shape a
    recurring decontamination job runs. :func:`decontaminate_fuzzy`
    takes one mixed frame, so a training corpus with a store still
    re-tokenizes the eval suite on every call (and a store cannot
    even be used unless the eval docs pollute the training corpus's
    artifacts). Here the eval suite — small and STATIC, the ideal
    artifact — is keyed under its own corpus name: its postings and
    signatures are built exactly once (the store's lazy read-through)
    and every later call on a grown training corpus pays two narrow
    eval-artifact scans instead of an O(eval) re-tokenize + re-hash.

    The eval suite rides the A (broadcast) side of
    :func:`~.operators.dedup.minhash_lsh_pairs_cross`; the training
    corpus streams from its artifacts on the B side with its sizes and
    hot-bucket census served delta-aware, so the per-call corpus cost
    is scan + explode + broadcast-probe — O(eval)-shaped, not
    O(corpus)-shuffle-shaped. Ids must be disjoint across the two
    corpora (the cross operator's contract). ``train_df`` /
    ``eval_df`` are only needed to build missing bases on first use —
    pass None against a pre-built store.

    Returns (``id_col``, n_fuzzy_matches, max_jaccard) per
    contaminated TRAINING document — same schema as
    :func:`decontaminate_fuzzy`, and pair-identical to it on a mixed
    frame when caps are off (pinned by
    ``tests/test_signature_store.py::
    test_decontaminate_fuzzy_cross_reads_both_sides_from_artifacts``;
    with a cap on, this form caps
    only training-side buckets while the mixed form caps both sides).
    """
    from .operators import dedup as D

    cap = DEFAULT_MAX_BAND_BUCKET if max_bucket == -1 else max_bucket
    if eval_df is not None:
        # artifacts are keyed by corpus NAME only: a revised eval
        # suite passed under the same name must fail loud here, not
        # silently decontaminate against the OLD suite's signatures
        # (train_df is exempt: the training corpus legitimately grows
        # past its first-build frame via append_batch deltas)
        store.assert_fresh(eval_df, eval_corpus, id_col, text_col)
    eval_posts = store.postings(eval_df, eval_corpus, id_col, text_col)
    eval_sig = store.signatures(eval_df, eval_corpus, id_col, text_col)
    train_posts = store.postings(train_df, train_corpus, id_col, text_col)
    train_sig = store.signatures(train_df, train_corpus, id_col, text_col)
    train_sizes = store.sizes(train_df, train_corpus, id_col, text_col)
    hot = (
        store.band_census(train_df, train_corpus, id_col, text_col)
        .filter(F.col("cnt") > cap)
        if cap is not None
        else None
    )
    cross = D.minhash_lsh_pairs_cross(
        eval_posts, eval_sig, train_posts, train_sig,
        threshold=threshold, max_band_bucket=cap,
        b_sizes=train_sizes, b_hot_buckets=hot,
    )
    return (
        cross.select(F.col("id_b").alias(id_col), "jaccard")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fuzzy_matches"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


def incremental_dedup(
    batch: DataFrame,
    store,
    corpus: str,
    corpus_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int | None = -1,
    commit_batch: str | None = None,
    defer_commit: bool = False,
) -> DataFrame:
    """Dedup a NEW batch of documents against an existing corpus
    snapshot — the daily-increment workflow a 100 TB pipeline actually
    runs. The corpus side is consumed ENTIRELY from persisted
    :class:`~.signature_store.SignatureStore` artifacts (fingerprints,
    postings, MinHash signatures): the historical text is never
    re-scanned, so per-batch cost is O(batch) compute plus
    artifact-scan I/O, independent of how many batches came before.

    Tiers, cheapest first:

    1. exact-vs-corpus: anti-join the batch's content fingerprints
       against the corpus fingerprint artifact (NULL-text rows have
       NULL fingerprints and therefore never match);
    2. exact-within-batch: keep min(id) per fingerprint, NULL-text
       rows pass through via per-row synthetic fingerprints (same
       contract as :func:`corpus_dedup`);
    3. near-dup: ONE connected-components pass over
       within-batch pairs (:func:`~.operators.dedup.minhash_lsh_pairs`
       on the batch's fresh artifacts) ∪ cross pairs
       (:func:`~.operators.dedup.minhash_lsh_pairs_cross` against the
       stored corpus artifacts). A batch doc is dropped if its
       component contains ANY corpus doc (the corpus always wins —
       history is already published), else if it is not the minimum
       batch id of its component. The single CC makes transitive
       chains THROUGH dropped batch members behave exactly like
       running :func:`corpus_dedup` over corpus ∪ batch (pinned by
       ``tests/test_incremental_dedup.py``).

    ``corpus_df``: only needed to build missing base artifacts on
    first use (a pre-built store never reads it). ``commit_batch``:
    when set, the survivors' artifact rows are appended to the store
    as an O(batch) delta (``SignatureStore.append_batch``), so the
    next batch deduplicates against corpus+this one. Ids must be
    unique across corpus ∪ batch (the store's keying contract).
    ``defer_commit=True`` keeps ``commit_batch``'s replay semantics
    (the corpus reads exclude that batch name) but SKIPS the append —
    for callers that cut the survivor set further (e.g. a semantic
    tier over the persisted vector index) and commit the final set
    themselves under the same name.

    Re-running with the SAME ``commit_batch`` name is idempotent
    end-to-end: the corpus reads exclude that batch's own delta (a
    prior attempt's commit is invisible to the re-run, so the batch
    never matches itself) and the re-commit replaces the delta
    wholesale — the at-least-once replay contract
    :func:`..streaming.pipeline.start_incremental_dedup` relies on.

    Hot-bucket caps default ON (``DEFAULT_MAX_BAND_BUCKET``), matching
    the rest of the pipeline layer.
    """
    from .operators import dedup as D
    from .operators.common import materialize
    from .operators.text import fingerprint

    cap = DEFAULT_MAX_BAND_BUCKET if max_bucket == -1 else max_bucket
    for path in (
        store.fingerprints_path(corpus),
        store.postings_path(corpus),
        store.signatures_path(corpus),
    ):
        if corpus_df is None and not store._is_complete(path):
            raise ValueError(
                f"corpus {corpus!r} artifact missing at {path} and no "
                "corpus_df given to build it"
            )
    # exclude_batch=commit_batch makes an at-least-once REPLAY of this
    # batch idempotent: the delta a previous attempt committed under
    # the same name is hidden from the corpus reads, so the batch's
    # documents never anti-join/band-match against themselves, and the
    # re-commit replaces that delta wholesale.
    corpus_fps = store.fingerprints(
        corpus_df, corpus, id_col, text_col, exclude_batch=commit_batch
    )
    corpus_posts = store.postings(
        corpus_df, corpus, id_col, text_col, exclude_batch=commit_batch
    )
    corpus_sig = store.signatures(
        corpus_df, corpus, id_col, text_col, exclude_batch=commit_batch
    )
    # derived aggregates: shingle-set sizes and the LSH bucket census,
    # read from delta-aware artifacts so the cross operator runs ZERO
    # O(corpus) shuffles per batch (its corpus-side work is then scan
    # + explode + broadcast-probe only)
    corpus_sizes = store.sizes(
        corpus_df, corpus, id_col, text_col, exclude_batch=commit_batch
    )
    hot_buckets = (
        store.band_census(
            corpus_df, corpus, id_col, text_col, exclude_batch=commit_batch
        ).filter(F.col("cnt") > cap)
        if cap is not None
        else None
    )

    # tier 1: exact duplicates of corpus content (anti-join on the
    # fingerprint artifact — 16-byte keys, no text in the shuffle)
    bat = batch.withColumn("_fp", fingerprint(text_col))
    bat = bat.join(
        corpus_fps.select(F.col("fp").alias("_fp")), "_fp", "left_anti"
    )

    # tier 2: exact duplicates within the batch (synthetic per-row
    # fingerprints keep NULL-text rows out of each other's groups)
    fp_syn = F.coalesce(
        F.col("_fp"), F.concat(F.lit("null:"), F.col(id_col).cast("string"))
    )
    keep = (
        bat.select(fp_syn.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    # consumed by the postings build, the CC drop anti-join, and the
    # returned frame — one batch scan, not three
    kept = bat.join(keep, id_col, "left_semi").drop("_fp").transform(materialize)

    # tier 3: near-dup — batch artifacts are computed fresh (O(batch));
    # the corpus side is artifact scans only
    batch_posts = D.hashed_postings(kept, id_col, text_col).transform(materialize)
    batch_sig = D._signatures_from_hashed(batch_posts, 64, 42)
    within = D.minhash_lsh_pairs(
        kept, id_col, text_col,
        threshold=threshold, max_band_bucket=cap,
        posts=batch_posts, sig=batch_sig,
    )
    cross = D.minhash_lsh_pairs_cross(
        batch_posts, batch_sig, corpus_posts, corpus_sig,
        threshold=threshold, max_band_bucket=cap,
        b_sizes=corpus_sizes, b_hot_buckets=hot_buckets,
    )
    edges = within.select("id_a", "id_b").union(cross.select("id_a", "id_b"))
    comp = D.connected_components(edges)
    # corpus membership by COMPLEMENT: a CC node is a corpus doc iff
    # it is not a batch doc — tested against the O(batch) id set (AQE
    # broadcasts it), never by scanning an O(corpus) artifact
    lab = comp.join(
        kept.select(F.col(id_col).alias("node"), F.lit(True).alias("is_batch")),
        "node",
        "left",
    )
    verdicts = lab.groupBy("component").agg(
        F.max(F.col("is_batch").isNull()).alias("has_corpus"),
        F.min(F.when(F.col("is_batch"), F.col("node"))).alias("min_batch"),
    )
    drop = (
        lab.filter(F.col("is_batch"))
        .join(verdicts, "component")
        .filter(F.col("has_corpus") | (F.col("node") != F.col("min_batch")))
        .select(F.col("node").alias(id_col))
    )
    survivors = kept.join(drop, id_col, "left_anti")
    if commit_batch is not None:
        # materialize once: append_batch derives three artifact frames
        # from survivors and the caller will consume it again — without
        # this the batch dedup DAG (CC included) would run 4×. The
        # append's first write bakes survivors into its cache, after
        # which the intermediate caches can be dropped — a long-running
        # stream calls this per epoch and must not accumulate persisted
        # frames (the caller unpersists survivors when done with it).
        survivors = survivors.transform(materialize)
        if not defer_commit:
            store.append_batch(
                survivors, corpus, commit_batch, id_col, text_col
            )
        else:
            # no append to bake the cache — force it, so the interior
            # caches can be released without a later full recompute
            survivors.count()
        kept.unpersist()
        batch_posts.unpersist()
    return survivors


def incremental_semantic_dedup(
    batch: DataFrame,
    store,
    corpus: str,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.999,
    n_centroids: int = 16,
    iters: int = 3,
    commit_batch: str | None = None,
    defer_commit: bool = False,
) -> DataFrame:
    """SemDeDup for the daily increment — the EMBEDDING tier of the
    incremental family beside :func:`incremental_dedup` (MinHash):
    drop a new batch's rows whose vectors semantically duplicate the
    PERSISTED corpus (cosine ≥ ``threshold`` against any indexed
    vector sharing their IVF cell) or each other (within-batch, same
    cell), with ONE connected-components pass and the corpus-wins
    rule — exactly :func:`..operators.similarity.semantic_dedup`'s
    semantics with the corpus side served from the
    :class:`~.signature_store.SignatureStore` IVF index instead of a
    per-call re-cluster.

    100 TB shape: the corpus is never re-scanned or re-clustered —
    the batch assigns against the frozen quantizer (one Arrow
    matmul over the SMALL side), occupies at most
    min(|batch|, n_centroids) cells, and the corpus probe reads ONLY
    those cell directories (partition pruning is the inverted-file
    read; the ``isin`` → PartitionFilters contract is pinned by
    ``tests/test_ivf_index.py::test_probe_prunes_to_probed_cells`` —
    the probe here executes inside the connected-components edge
    collect, so it cannot be re-asserted from the survivors' plan).
    Per-batch cost is O(batch × occupied-cell mass), independent of
    corpus size. The batch side of the cross join is explicitly
    broadcast (bounded per epoch by construction).

    Approximation contract (same as ``semantic_dedup``): only
    same-cell pairs are candidates. Exact duplicates always share a
    nearest centroid under the index's frozen quantizer; boundary
    near-misses can escape, and heavy drift degrades cell quality
    until :meth:`~.signature_store.SignatureStore.ivf_retrain`
    repairs it for future batches.

    NULL-``vec_col`` rows pass through untouched (the contract NULL
    text has in :func:`incremental_dedup`); ids must be unique across
    corpus ∪ batch (the store's keying contract). ``commit_batch``
    appends the survivors' vectors as an O(batch) index delta; the
    corpus reads exclude that batch name, so at-least-once replay is
    idempotent (``defer_commit`` as in :func:`incremental_dedup`).

    Cache ownership: the returned survivors frame is materialized and
    forced on EVERY path (the cell-probe collect and the CC edge pass
    make this function mostly eager anyway), and all interior caches
    are released before returning — a long-running stream calls this
    per epoch and must not accumulate persisted frames. The caller
    unpersists survivors when done with it.
    """
    from .operators.common import materialize
    from .operators.dedup import connected_components
    from .operators.similarity import _dbl, cosine, ivf_assignments

    C = store.ivf_centroids(
        None, corpus, n_centroids=n_centroids, iters=iters
    )
    has_vec = F.col(vec_col).isNotNull()
    null_rows = batch.filter(~has_vec)
    # consumed by assign + both pair joins + the returned frame
    vec_rows = batch.filter(has_vec).transform(materialize)

    b = ivf_assignments(
        vec_rows.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v")),
        C, "id", "_v", nprobe=1,
    ).join(
        vec_rows.select(
            F.col(id_col).alias("id"), _dbl(F.col(vec_col)).alias("v")
        ),
        "id",
    ).transform(materialize)
    # ^ the batch's own (id, cell, v) inverted file — O(batch), cached
    # once for its four consumers (within-pairs self-join, occupied-
    # cell collect, cross-join broadcast side, CC label join) instead
    # of re-running the assignment matmul per consumer

    # within-batch: same-cell pairs only (SemDeDup's candidate rule)
    within = (
        b.select("cell", F.col("id").alias("id_a"), F.col("v").alias("va"))
        .join(
            b.select(
                "cell", F.col("id").alias("id_b"), F.col("v").alias("vb")
            ),
            "cell",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        # round(6) before thresholding — semantic_dedup's boundary
        # rule, so an exact-boundary pair classifies identically in
        # the batch and incremental tiers
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= threshold)
        .select("id_a", "id_b")
    )

    # cross: the persisted index pruned to the batch's occupied cells
    # (bounded driver collect: ≤ n_centroids ints — the probe set)
    occupied = sorted(
        r["cell"] for r in b.select("cell").distinct().collect()
    )
    idx = store.ivf_index(
        None, corpus, n_centroids=n_centroids, iters=iters,
        exclude_batch=commit_batch,
    ).filter(F.col("cell").isin(occupied))
    cross = (
        idx.select("cell", F.col("id").alias("id_a"), F.col("v").alias("va"))
        .join(
            F.broadcast(
                b.select(
                    "cell", F.col("id").alias("id_b"), F.col("v").alias("vb")
                )
            ),
            "cell",
        )
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= threshold)
        .select("id_a", "id_b")
    )

    comp = connected_components(within.unionByName(cross))
    lab = comp.join(
        b.select(F.col("id").alias("node"), F.lit(True).alias("is_batch")),
        "node",
        "left",
    )
    verdicts = lab.groupBy("component").agg(
        F.max(F.col("is_batch").isNull()).alias("has_corpus"),
        F.min(F.when(F.col("is_batch"), F.col("node"))).alias("min_batch"),
    )
    drop = (
        lab.filter(F.col("is_batch"))
        .join(verdicts, "component")
        .filter(F.col("has_corpus") | (F.col("node") != F.col("min_batch")))
        .select(F.col("node").alias(id_col))
    )
    survivors = (
        vec_rows.join(drop, id_col, "left_anti")
        .unionByName(null_rows)
        .transform(materialize)
    )
    if commit_batch is not None and not defer_commit:
        # the append's first write bakes survivors into its cache
        store.ivf_append(
            survivors.filter(has_vec), corpus, commit_batch,
            id_col=id_col, vec_col=vec_col,
            n_centroids=n_centroids, iters=iters,
        )
    else:
        # no append to bake the cache — force it before dropping the
        # interior caches (same hygiene as incremental_dedup)
        survivors.count()
    b.unpersist()
    vec_rows.unpersist()
    return survivors


def media_curation(
    df: DataFrame,
    min_duration_ms: float | None = None,
    max_duration_ms: float | None = None,
    min_width: int | None = None,
    min_height: int | None = None,
    min_bitrate_kbps: float | None = None,
    allowed_containers: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Filter-before-decode media curation — the FIRST pass a crawl's
    binary corpus goes through: one
    :func:`~.operators.multimodal.probe_media_metadata` scan (magic
    dispatch to the header-level parsers; mapInPandas, Arrow, zero
    shuffle) and cheap metadata predicates on its UNIFORM output, so
    the expensive full decode only ever runs on survivors.

    Returns ``{"kept", "rejected", "quarantined"}`` frames, all
    carrying the probe columns: ``quarantined`` = blobs the parsers
    refused (``ok = false``, ``err`` says why), ``rejected`` = parsed
    fine but failed a predicate (``reject_reason`` says which — a
    kept/rejected/quarantined row count per reason is the audit a
    100 TB curation run reports), ``kept`` = everything else. Every
    input ``media_id`` lands in exactly one frame. The probe frame is
    materialized once and fans out to the three cuts — callers should
    ``unpersist`` any of the returned frames' parents when done, or
    simply let the short-lived job release it.
    """
    from .operators.common import materialize
    from .operators.multimodal import probe_media_metadata

    probed = probe_media_metadata(df).transform(materialize)
    bad = probed.filter(~F.col("ok"))
    parsed = probed.filter(F.col("ok"))

    reasons = []
    if allowed_containers is not None:
        reasons.append(
            (~F.col("container").isin(allowed_containers), "container")
        )
    if min_duration_ms is not None:
        reasons.append(
            (F.col("duration_ms") < min_duration_ms, "too_short")
        )
    if max_duration_ms is not None:
        reasons.append((F.col("duration_ms") > max_duration_ms, "too_long"))
    if min_width is not None:
        reasons.append((F.col("width") < min_width, "width"))
    if min_height is not None:
        reasons.append((F.col("height") < min_height, "height"))
    if min_bitrate_kbps is not None:
        reasons.append(
            (F.col("bitrate_kbps") < min_bitrate_kbps, "bitrate")
        )
    # NULL predicate values (e.g. duration on a still image) never
    # reject: coalesce each test to false so predicates only act on
    # the media kinds that carry the field
    reject = F.lit(None).cast("string")
    for cond, tag in reversed(reasons):
        reject = F.when(F.coalesce(cond, F.lit(False)), tag).otherwise(reject)
    parsed = parsed.withColumn("reject_reason", reject)
    return {
        "kept": parsed.filter(F.col("reject_reason").isNull()).drop(
            "reject_reason"
        ),
        "rejected": parsed.filter(F.col("reject_reason").isNotNull()),
        "quarantined": bad,
    }
