"""Query registry — the driver-facing catalogue of every implemented
operator (SURVEY.md §2 + LLM-data extensions).

Each :class:`QuerySpec` pairs a Spark implementation with the
ANSI-SQL oracle string the driver runs through DuckDB. Contract rules
(see /root/repo/__spark_entry__.py):

- every computed column is aliased IDENTICALLY in both;
- every floating-point output is ``round(x, 6)`` in both (cross-engine
  double determinism);
- output ordering is irrelevant (driver hashes order-insensitively)
  but ties inside ranking/dedup operators are broken deterministically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    survey: str  # SURVEY.md §2 operator ids covered (or "ext:*")
    description: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, survey: str, description: str = ""
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, survey, description)
        return fn

    return deco


# The external correctness driver samples the FIRST 50 registry
# entries each round. With 109 registered queries, registration order
# decides which get an external differential-check row, so the order
# is explicit and rotated each round toward whatever has the weakest
# external evidence. Round-4 front window, weakest evidence first:
# (a) the three round-3-new queries never externally sampled, the
# round-4-new shard_assignment, and the three whose r3 rows were red
# on oracle-side type canonicalization (fixed this round — Spark
# values were already identical); (b) the eight queries whose only
# green row dates to round 1; (c) the twelve whose single green row
# dates to round 2; (d) 23 of the 35 queries with two green rows
# whose latest is round 2, preferring complex plans
# (joins/windows/dedup) over simple codegen aggregates.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) never externally green (7; shard_assignment is round-4-new)
    "quarantine_rows", "duplicated_spans", "pii_redact",
    "shard_assignment",
    "shipmode_priority", "tumbling_window_agg", "sliding_window_agg",
    # (b) single green row, round 1 (8)
    "stratified_sample", "sequence_packing", "corpus_curation",
    "vocab_topk", "decontaminate", "repetition_ratio",
    "chunk_documents", "dup_cluster_keep",
    # (c) single green row, round 2 (12)
    "incident_window_join", "distribution_rank", "window_dedup",
    "skew_salted_join", "trade_pagerank", "data_quality_report",
    "incremental_agg_merge", "snapshot_diff_feed", "winsorized_stats",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    # (d) two green rows, latest round 2 — complex-plan subset (23)
    "grouped_zscore", "session_windows", "time_range_window",
    "asof_join", "topk_per_group", "warehouse_metrics",
    "latest_per_key", "snapshot_join", "union_dedup_keeplast",
    "pivot_daily_mean", "corr_matrix", "gap_fill_forward",
    "cohort_retention", "funnel_conversion", "rolling_volatility",
    "max_drawdown", "text_fingerprint",
    "ngram_jaccard_pairs", "lang_id", "text_quality",
    "multimodal_features", "multimodal_frame_plan", "cosine_topk",
)
# Outside this window: the 47 queries hash-green in round 3 (freshest
# possible evidence) and 12 double-green queries (tz_convert,
# rollup/cube_revenue, ranking_suite, unpivot_measures,
# exact_percentiles, set_operations, value_histogram, top1_by_metric,
# distinct_sorted_keys, group_share, text_stats). Until round 4 results land, the
# three (a)-queries quarantine_rows / duplicated_spans / pii_redact
# rely on the local exact-equality parity suite only; every other
# registered query has >=1 external green row across rounds 1-3, and
# all 108 are re-checked by tests/test_oracle_parity.py every run.


def registry() -> dict[str, QuerySpec]:
    """All registered queries (importing submodules to populate),
    ordered so the driver's first-50 sample hits the queries with the
    weakest external evidence first (see ``_DRIVER_PRIORITY``)."""
    from . import advanced, analytics, llmdata, relational, streaming_q  # noqa: F401

    missing = [n for n in _DRIVER_PRIORITY if n not in _REGISTRY]
    if missing:
        raise KeyError(f"_DRIVER_PRIORITY names unknown queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY}
    ordered.update(
        (n, s) for n, s in _REGISTRY.items() if n not in ordered
    )
    return ordered


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.fn for n, s in registry().items()}


def oracle_map() -> dict[str, str]:
    return {n: s.oracle for n, s in registry().items() if s.oracle is not None}
