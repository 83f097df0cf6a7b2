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


def registry() -> dict[str, QuerySpec]:
    """All registered queries (importing submodules to populate)."""
    from . import advanced, analytics, llmdata, relational, streaming_q  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.fn for n, s in registry().items()}


def oracle_map() -> dict[str, str]:
    return {n: s.oracle for n, s in registry().items() if s.oracle is not None}
