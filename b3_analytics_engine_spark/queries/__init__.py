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
# entries each round. With 152 registered queries, registration order
# decides which get an external differential-check row, so the order
# is explicit and rotated each round toward whatever has the weakest
# external evidence. Round-17 front window (round 16 went 50/50
# green; exactly the rotation the r16 verdict item 7 prescribed):
# the weakest-50 as computed by tools/rotation_report.py on the r16
# CORRECTNESS file —
# (a) text_fingerprint + text_quality: last external green r13, the
# two r13-cohort members the r16 window left out (the r16 verdict
# named them to head this line);
# (b) the round-14 cohort (last green r14), fewest-greens-first then
# name — 33 tier-(14,4) queries, then 6 tier-(14,5), then the first 9
# of tier-(14,6), exactly as the report orders them.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) last green r13 — stalest evidence in the registry (2)
    "text_fingerprint", "text_quality",
    # (b) last green r14, 4 greens each (33)
    "acf_per_key", "anomaly_mad", "audio_decode_stats", "beta_per_key",
    "bigram_logprob", "bpe_merge_pairs", "containment_pairs",
    "decayed_engagement", "decontaminate_bloom", "decontaminate_fuzzy",
    "dedup_keep_best", "embedding_quantize", "event_transitions",
    "fuzzy_levenshtein_pairs", "image_decode_stats",
    "image_resize_stats", "k_anonymity", "key_skew_audit", "ks_drift",
    "mixture_rebalance", "negative_sampling", "ngram_novelty",
    "ohlc_bars", "oov_rate", "pmi_collocations", "png_decode_stats",
    "psi_drift", "scd2_history", "semantic_dedup", "source_overlap",
    "source_quota_cap", "stream_stream_join_twin", "temperature_mix",
    # (b) last green r14, 5 greens each (6)
    "char_entropy", "duplicated_spans", "embedding_neardup",
    "min_cost_supplier", "regional_revenue", "tumbling_window_agg",
    # (b) last green r14, 6 greens each — first 9 by name (9)
    "corr_matrix", "cosine_topk", "cube_revenue", "dedup_minhash_lsh",
    "dedup_simhash", "incident_window_join", "repetition_ratio",
    "rollup_revenue", "topk_per_group",
)
# Outside this window: union_dedup_keeplast + warehouse_metrics (the
# r14 cohort's strongest-evidence tail — they head r18's line), the
# round-15 cohort (checked two rounds ago) and the round-16 cohort
# (checked last round). All registered queries are re-checked by
# tests/test_oracle_parity.py every run, and tests/test_scan_audit.py
# pins every query's physical scan counts.


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
