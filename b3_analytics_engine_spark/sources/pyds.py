"""Spark 4 Python Data Source for the quote feed (SURVEY S7/S8).

`rest.py` keeps the reference's topology: fetch on the driver, enter
the engine as a DataFrame (3 tickers/minute needs nothing more). This
module is the scale path for the same source contract: a registered
`spark.read.format("quote_feed")` data source that plans ONE input
partition per ticker, so ten thousand symbols fan out across the
cluster as ten thousand bounded tasks instead of a driver-side loop
(reference include/tasks/brapi_producer.py:19-30 fetches serially).

The shipped reader is deterministic/fixture-backed (md5-derived
quotes — no network in tests or CI); a production deployment
overrides `_fetch_one` with the real HTTP GET. The partition-per-key
planning, schema contract, and executor-side evaluation are exactly
what the real source uses.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

QUOTE_SCHEMA_DDL = (
    "symbol string, open double, high double, low double, close double, "
    "volume bigint, ts timestamp"
)


def _hash_unit(key: str) -> float:
    """Deterministic uniform [0,1) from a string key (md5, like the
    engine's sampling operators — reproducible on any executor)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2**32


class TickerPartition(InputPartition):
    def __init__(self, ticker: str):
        self.ticker = ticker


class QuoteFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.tickers = [
            t for t in options.get("tickers", "").split(",") if t
        ]
        self.as_of = options.get("as_of", "2024-01-30T00:00:00")

    def partitions(self):
        # one bounded unit of external I/O per task — the fan-out knob
        return [TickerPartition(t) for t in self.tickers]

    def read(self, partition: TickerPartition):
        row = self._fetch_one(partition.ticker)
        yield row

    def _fetch_one(self, ticker: str):
        """Fixture fetch: deterministic OHLCV from the ticker name.
        Production subclasses replace this one method with the HTTP
        call; everything else (planning, schema, distribution) stays."""
        base = 20.0 + 80.0 * _hash_unit(ticker)
        spread = base * 0.05
        o = round(base - spread * _hash_unit(ticker + ":o"), 6)
        c = round(base + spread * _hash_unit(ticker + ":c"), 6)
        hi = round(max(o, c) + spread * _hash_unit(ticker + ":h"), 6)
        lo = round(min(o, c) - spread * _hash_unit(ticker + ":l"), 6)
        vol = int(1_000_000 * _hash_unit(ticker + ":v"))
        ts = datetime.fromisoformat(self.as_of).replace(tzinfo=timezone.utc)
        return (ticker, o, hi, lo, c, vol, ts)


class QuoteFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "quote_feed"

    def schema(self) -> str:
        return QUOTE_SCHEMA_DDL

    def reader(self, schema) -> QuoteFeedReader:
        return QuoteFeedReader(self.options)


def register_quote_feed(spark) -> None:
    spark.dataSource.register(QuoteFeedDataSource)
