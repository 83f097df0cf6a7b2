"""Pinned scan-redundancy invariant over the WHOLE registry.

Every extra physical scan node over a base table is a full corpus
pass at 100 TB. Round 7's `tools/scan_audit.py` made this measurable
but was advisory; round 7's one regression (`ngram_novelty`: a shared
postings frame recomputed per consumer, 2 corpus scans) slipped
through because nothing failed. This test pins the EXACT multi-scan
snapshot: any query whose per-table scan-node count grows — or any
new query that scans a table more than once — fails here and must
either fix the plan (usually `operators.common.materialize` on the
shared frame) or consciously update the snapshot with a justification.

The snapshot below was audited entry by entry. The ≥3 rows are
genuinely multi-pass algorithms:

- ``anomaly_mad`` (3): median, then MAD = median of |x - med|, then
  the flagging join — MAD is inherently two dependent medians.
- ``data_quality_report`` (3): profile + two differently-grouped
  audit frames, union'd.
- ``trade_pagerank`` (5): nation is the 25-row vertex dim, re-read
  around the iterative loop — bytes are trivial.
- ``cosine_ann_lsh`` / ``cosine_ann_ivf`` (6): the ANN result PLUS
  the brute-force recall-verification frame (which exists to grade
  the ANN path); the bench-only ``*_raw`` variants skip it.
- ``embedding_neardup`` (5) / ``semantic_dedup`` (3): LSH/centroid
  bucketing + exact-cosine confirm passes over the vector column.

The 2-scan rows are self-joins or agg-then-join-back shapes (semi+
anti over the same table, per-key stats joined back to rows) where
the second scan is column-pruned and cheap; each was checked to have
no shared-frame-recomputed subplan. (``asof_join`` left this list in
round 17: its purchase/click union became one event_type-IN scan
with conditional projections — value-identical, single scan, and the
shape a user_id-bucketed layout needs to plan zero exchanges.)
(``char_entropy``, ``duplicated_spans`` and ``repetition_ratio``
left this list in round 8: their agg-then-join-back shapes became
single-pass window/grouped aggregates — value-identical, one scan
each; the replayed subtrees included per-span md5 / shingle-window
compute, so the second scan was a full recompute, not a cheap
pruned re-read. ``decontaminate``, ``decontaminate_bloom`` and
``waiting_suppliers`` left in round 16: one materialized postings /
fact-join frame replaced per-consumer recomputation — the "cheap"
second scan was re-running a tokenize pass or a broadcast join.)
"""

from __future__ import annotations

from b3_analytics_engine_spark.plans import parquet_scan_counts
from b3_analytics_engine_spark.queries import registry

SF_DIR = "/root/testdata/sf0.001"

# query -> {table: scan-node count}, only entries with count >= 2
EXPECTED_MULTI_SCANS = {
    "anomaly_mad": {"events": 3},
    "benford_audit": {"orders": 2},
    "beta_per_key": {"events": 2},
    "cohort_retention": {"events": 2},
    "cosine_ann_ivf": {"embeddings": 6},
    "cosine_ann_lsh": {"embeddings": 6},
    "cosine_topk": {"embeddings": 2},
    "data_quality_report": {"lineitem": 3},
    "decayed_engagement": {"events": 2},
    "dominant_suppliers": {"lineitem": 2, "part": 2},
    "dormant_customers": {"customer": 2},
    "embedding_neardup": {"embeddings": 5},
    "embedding_neardup_exact": {"embeddings": 2},
    "fuzzy_levenshtein_pairs": {"documents": 2},
    "gap_fill_forward": {"events": 2},
    "group_share": {"events": 2},
    "incident_window_join": {"events": 2},
    "incremental_agg_merge": {"events": 2},
    "join_normalized_key": {"events": 2},
    "key_skew_audit": {"events": 2},
    "lang_id": {"documents": 2},
    "lang_mismatch_audit": {"documents": 2},
    "market_share": {"nation": 2},
    "mixture_rebalance": {"documents": 2},
    "nation_trade_volume": {"nation": 2},
    "negative_sampling": {"embeddings": 2},
    "semantic_dedup": {"embeddings": 3},
    "set_operations": {"events": 2},
    "small_order_quantity": {"lineitem": 2},
    "snapshot_diff_feed": {"events": 2},
    "snapshot_join": {"events": 2},
    "source_overlap": {"documents": 2},
    "stream_stream_join_twin": {"events": 2},
    "temperature_mix": {"documents": 2},
    "tfidf_topterms": {"documents": 2},
    "trade_pagerank": {"nation": 5},
    "union_dedup_keeplast": {"events": 2},
    "winsorized_stats": {"events": 2},
}


def test_registry_scan_counts_pinned(registry_plan_audit):
    got: dict[str, dict[str, int]] = {}
    for name, audit in registry_plan_audit.items():
        multi = {t: n for t, n in audit["scans"].items() if n >= 2}
        if multi:
            got[name] = multi

    regressed = {
        q: (EXPECTED_MULTI_SCANS.get(q), multi)
        for q, multi in got.items()
        if multi != EXPECTED_MULTI_SCANS.get(q)
    }
    improved = {
        q: exp for q, exp in EXPECTED_MULTI_SCANS.items() if q not in got
    }
    assert not regressed, (
        "scan-count regressions (expected, got) — a shared frame is "
        "being recomputed per consumer; materialize() it or justify "
        f"an updated snapshot: {regressed}"
    )
    assert not improved, (
        "queries now scan LESS than the pinned snapshot — great, "
        f"update EXPECTED_MULTI_SCANS: {improved}"
    )


def test_ngram_novelty_scans_corpus_once(spark):
    """Round-8 fix pin: the r7 regression was this query scanning
    `documents` twice via an unmaterialized postings frame."""
    spec = registry()["ngram_novelty"]
    try:
        counts = parquet_scan_counts(spec.fn(spark, SF_DIR))
    finally:
        spark.catalog.clearCache()
    assert counts.get("documents", 0) == 1, counts
