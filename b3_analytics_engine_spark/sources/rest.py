"""REST / external-API sources (S7 brapi, S8 yfinance).

Design rule: external I/O stays on the DRIVER and enters the engine as
a DataFrame built from fetched records — the engine never makes
per-row network calls from executors (that pattern melts at 1000
executors and is untestable). Fetchers are injectable so tests use
fixtures; production wires real HTTP clients.

The reference fetches three tickers per minute driver-side too
(reference include/tasks/brapi_producer.py:19-30,
include/tasks/yfinance_to_postgres.py:65-88) — same topology, minus
Airflow.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import BRAPI_PAYLOAD, BRAPI_QUOTE, YFINANCE_QUOTE

FetchFn = Callable[[str], dict]


def quotes_from_payloads(
    spark: SparkSession, payloads: Iterable[dict]
) -> DataFrame:
    """brapi payloads ({"results": [quote]}) → typed quote rows.

    The nested take-first (`data["results"][0]`, reference
    include/tasks/brapi_producer.py:29) is expressed with
    element_at(results, 1) over an ArrayType(StructType) schema —
    ANSI-safe via try_element_at.
    """
    import json

    raw = spark.createDataFrame(
        [(json.dumps(p),) for p in payloads],
        T.StructType([T.StructField("value", T.StringType())]),
    )
    parsed = raw.select(
        F.from_json(F.col("value"), BRAPI_PAYLOAD, {"mode": "PERMISSIVE"}).alias("p")
    )
    return parsed.select(F.try_element_at("p.results", F.lit(1)).alias("q")).select(
        "q.*"
    )


def fetch_brapi_quotes(
    spark: SparkSession, tickers: list[str], fetch: FetchFn
) -> DataFrame:
    """S7: driver-side GET per ticker → DataFrame[BRAPI_QUOTE]."""
    return quotes_from_payloads(spark, [fetch(t) for t in tickers])


def fetch_yfinance_bars(
    spark: SparkSession, tickers: list[str], fetch: FetchFn
) -> DataFrame:
    """S8: latest daily bar per ticker → DataFrame[YFINANCE_QUOTE].
    fetch(t) returns {symbol, open, high, low, close, volume,
    timestamp(iso str)}."""
    rows = []
    for t in tickers:
        r = fetch(t)
        rows.append(
            (
                r["symbol"],
                float(r["open"]),
                float(r["high"]),
                float(r["low"]),
                float(r["close"]),
                int(r["volume"]),
                r["timestamp"],
            )
        )
    schema = T.StructType(
        [f if f.name != "timestamp" else T.StructField("timestamp", T.StringType()) for f in YFINANCE_QUOTE.fields]
    )
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("timestamp", F.to_timestamp("timestamp"))
