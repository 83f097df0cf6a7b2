"""End-to-end pipeline compositions (SURVEY.md §3 E1/E3) — thin
orchestration over the operator library, replacing the reference's
Airflow DAGs.

E2 (the incremental micro-batch pipeline) lives in
``streaming/pipeline.py``.
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
