"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``b3_analytics_engine_spark``; this module is
the thin adapter. Contract rules applied throughout the registry:

- identical column aliases between Spark and oracle SQL;
- every floating-point output rounded to 6 dp on BOTH sides;
- deterministic tie-breaks inside ranking/dedup operators;
- ANSI-safe expressions (the driver's Spark 4 session has
  ``spark.sql.ansi.enabled=true``): try_cast, guarded denominators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from b3_analytics_engine_spark.queries import oracle_map, spark_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The E2-condensed warehouse pipeline (SURVEY.md §3 E2): daily bars →
    SMA-5/20 → daily + cumulative returns → turnover, per key.
    """
    from b3_analytics_engine_spark.queries.analytics import warehouse_metrics

    return warehouse_metrics(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-data
    extensions). Each callable takes (spark, sf_dir) → DataFrame."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL twin for every registered query — all of
    them hash-checkable. Approximate operators (sketch aggregates,
    ANN, LSH near-dup) register deterministic bound-vs-exact /
    recall-vs-exact verification outputs whose oracle side is exact
    SQL, so even they fail the hash check if they regress."""
    return oracle_map()
