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
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

QUOTE_SCHEMA_DDL = (
    "symbol string, open double, high double, low double, close double, "
    "volume bigint, ts timestamp"
)


def _hash_unit(key: str) -> float:
    """Deterministic uniform [0,1) from a string key (md5, like the
    engine's sampling operators — reproducible on any executor)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2**32


def _synth_quote(key: str, ts: datetime):
    """Deterministic OHLCV row from an arbitrary string key — shared by
    the batch reader (key = ticker) and the stream reader (key =
    ticker@tick), so replays and retries always regenerate identical
    rows."""
    ticker = key.split("@", 1)[0]
    base = 20.0 + 80.0 * _hash_unit(key)
    spread = base * 0.05
    o = round(base - spread * _hash_unit(key + ":o"), 6)
    c = round(base + spread * _hash_unit(key + ":c"), 6)
    hi = round(max(o, c) + spread * _hash_unit(key + ":h"), 6)
    lo = round(min(o, c) - spread * _hash_unit(key + ":l"), 6)
    vol = int(1_000_000 * _hash_unit(key + ":v"))
    return (ticker, o, hi, lo, c, vol, ts)


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
        ts = datetime.fromisoformat(self.as_of).replace(tzinfo=timezone.utc)
        return _synth_quote(ticker, ts)


class QuoteFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the quote feed: one poll tick per micro-batch,
    one row per ticker per tick (the reference's 60 s producer loop,
    ingestion_services/postgres_producer/main.py:56-79, as a Spark
    stream source with real offsets instead of a fresh-consumer full
    re-read).

    Offsets are ``{"tick": n}``; rows for a tick are a pure function
    of (ticker, tick), so ``readBetweenOffsets`` — the replay path the
    engine calls after a failure before the batch is committed —
    regenerates byte-identical data and exactly-once downstream
    semantics hold without any source-side buffering.
    """

    def __init__(self, options: dict):
        self.tickers = [t for t in options.get("tickers", "").split(",") if t]
        self.as_of = datetime.fromisoformat(
            options.get("as_of", "2024-01-30T00:00:00")
        ).replace(tzinfo=timezone.utc)
        self.tick_seconds = int(options.get("tick_seconds", "60"))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def _tick_rows(self, tick: int):
        ts = self.as_of + timedelta(seconds=tick * self.tick_seconds)
        return [_synth_quote(f"{t}@{tick}", ts) for t in self.tickers]

    def read(self, start: dict):
        tick = start["tick"]
        return iter(self._tick_rows(tick)), {"tick": tick + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            row
            for k in range(start["tick"], end["tick"])
            for row in self._tick_rows(k)
        )

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: ticks are synthesized, not buffered


class QuoteFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "quote_feed"

    def schema(self) -> str:
        return QUOTE_SCHEMA_DDL

    def reader(self, schema) -> QuoteFeedReader:
        return QuoteFeedReader(self.options)

    def simpleStreamReader(self, schema) -> QuoteFeedStreamReader:
        return QuoteFeedStreamReader(self.options)


def register_quote_feed(spark) -> None:
    spark.dataSource.register(QuoteFeedDataSource)
