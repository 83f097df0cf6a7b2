"""Unit tests for the pandas-semantics edge cases the reference
exhibits (SURVEY.md §7 risk register), on tiny literal frames:

- W1 rolling mean min_periods=1 (shrinking leading frame)
- W3 pct_change first-row null
- W4 cumprod null skipping (pandas skipna behavior)
- A1 keep-last tie-breaking via explicit priority
- P10 change_day falsy guard (open == 0.0 → default, not just null)
- J2 symbol suffix normalization
- K4 upsert-ignore (in-batch dup + existing-key skip)
- E2 micro-batch: enrich → merge, idempotent under replay
"""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from b3_analytics_engine_spark.operators.aggregates import keep_last_dedup
from b3_analytics_engine_spark.operators.joins import normalize_symbol
from b3_analytics_engine_spark.operators.rowops import falsy_guarded_diff
from b3_analytics_engine_spark.operators.windows import (
    cumulative_return,
    pct_change,
    rolling_mean,
)
from b3_analytics_engine_spark.sinks.jdbc import upsert_ignore
from b3_analytics_engine_spark.streaming.pipeline import (
    process_micro_batch,
    warehouse_merge,
)


def _series(spark, vals, key="A"):
    return spark.createDataFrame(
        [Row(symbol=key, date=i, close=float(v) if v is not None else None) for i, v in enumerate(vals)]
    )


def test_rolling_mean_min_periods_1(spark):
    # pandas: rolling(3, min_periods=1).mean() -> [1, 1.5, 2, 3]
    df = rolling_mean(_series(spark, [1, 2, 3, 4]), "close", "symbol", "date", 3, "sma")
    got = [r["sma"] for r in df.orderBy("date").collect()]
    assert got == [1.0, 1.5, 2.0, 3.0]


def test_pct_change_first_row_null(spark):
    df = pct_change(_series(spark, [100, 110, 99]), "close", "symbol", "date", "r")
    got = [r["r"] for r in df.orderBy("date").collect()]
    assert got[0] is None
    assert math.isclose(got[1], 0.10)
    assert math.isclose(got[2], -0.10)


def test_pct_change_zero_prev_is_null(spark):
    # pandas gives inf; we document NULL (ANSI- and SQL-oracle-safe)
    df = pct_change(_series(spark, [0.0, 5.0]), "close", "symbol", "date", "r")
    got = [r["r"] for r in df.orderBy("date").collect()]
    assert got == [None, None]


def test_cumprod_skips_nulls_like_pandas(spark):
    # pandas: (1+r).cumprod()-1 with r=[None, .1, None, .2]
    #   -> [NaN, 0.1, NaN(position), 0.32] (skipna accumulates past NaN)
    rows = [Row(symbol="A", date=i, r=v) for i, v in enumerate([None, 0.1, None, 0.2])]
    df = cumulative_return(spark.createDataFrame(rows), "r", "symbol", "date", "c")
    got = [r["c"] for r in df.orderBy("date").collect()]
    assert got[0] is None
    assert math.isclose(got[1], 0.1)
    assert got[2] is None
    assert math.isclose(got[3], 1.1 * 1.2 - 1)


def test_keep_last_dedup_priority(spark):
    rows = [
        Row(symbol="A", date=1, v="old", p=0),
        Row(symbol="A", date=1, v="new", p=1),
        Row(symbol="B", date=1, v="only", p=0),
    ]
    df = keep_last_dedup(
        spark.createDataFrame(rows), ["symbol", "date"], [F.col("p")]
    )
    got = {r["symbol"]: r["v"] for r in df.collect()}
    assert got == {"A": "new", "B": "only"}


def test_change_day_falsy_guard(spark):
    rows = [
        Row(close=10.0, open=8.0),   # normal: 2
        Row(close=10.0, open=0.0),   # falsy open -> 0 (NOT 10)
        Row(close=None, open=8.0),   # null close -> 0
        Row(close=0.0, open=8.0),    # falsy close -> 0 (NOT -8)
    ]
    df = spark.createDataFrame(rows).select(
        falsy_guarded_diff("close", "open").alias("cd")
    )
    assert [r["cd"] for r in df.collect()] == [2.0, 0.0, 0.0, 0.0]


def test_symbol_normalization(spark):
    rows = [Row(s="PETR4.SA"), Row(s="^BVSP"), Row(s="SAPR4.SA"), Row(s="X.SAY")]
    df = spark.createDataFrame(rows).select(normalize_symbol("s").alias("n"))
    # only the trailing .SA is stripped; ^BVSP and inner .SA untouched
    assert [r["n"] for r in df.collect()] == ["PETR4", "^BVSP", "SAPR4", "X.SAY"]


def test_upsert_ignore(spark):
    existing = spark.createDataFrame(
        [Row(symbol="A", ts=1, v=1.0), Row(symbol="B", ts=1, v=2.0)]
    )
    new = spark.createDataFrame(
        [
            Row(symbol="A", ts=1, v=99.0),  # conflict -> skipped
            Row(symbol="A", ts=2, v=3.0),   # new key -> kept
            Row(symbol="A", ts=2, v=4.0),   # in-batch dup -> one survives
        ]
    )
    out = upsert_ignore(new, existing, ["symbol", "ts"])
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["ts"] == 2


def _feed_batch(spark, clock_str="2024-05-01 12:00:00"):
    """A tagged micro-batch with both feeds (brapi + yfinance)."""
    brapi = [
        # two messages for PETR4: later _ingest_ts must win (dict overwrite)
        Row(_feed="brapi", symbol="PETR4", longName="Petrobras PN",
            regularMarketPrice=36.0, regularMarketChange=0.5,
            regularMarketChangePercent=1.4, marketCap=500000000000,
            _ingest_ts=1, open=None, high=None, low=None, close=None,
            volume=None, timestamp=None),
        Row(_feed="brapi", symbol="PETR4", longName="Petrobras PN",
            regularMarketPrice=36.5, regularMarketChange=1.0,
            regularMarketChangePercent=2.8, marketCap=505000000000,
            _ingest_ts=2, open=None, high=None, low=None, close=None,
            volume=None, timestamp=None),
        Row(_feed="brapi", symbol="VALE3", longName="Vale ON",
            regularMarketPrice=61.0, regularMarketChange=-0.2,
            regularMarketChangePercent=-0.3, marketCap=280000000000,
            _ingest_ts=1, open=None, high=None, low=None, close=None,
            volume=None, timestamp=None),
    ]
    yfin = [
        Row(_feed="yfinance", symbol="PETR4.SA", longName=None,
            regularMarketPrice=None, regularMarketChange=None,
            regularMarketChangePercent=None, marketCap=None, _ingest_ts=None,
            open=35.8, high=36.9, low=35.5, close=36.5, volume=41000000,
            timestamp="2024-05-01 11:59:00"),
        Row(_feed="yfinance", symbol="VALE3.SA", longName=None,
            regularMarketPrice=None, regularMarketChange=None,
            regularMarketChangePercent=None, marketCap=None, _ingest_ts=None,
            open=61.2, high=61.4, low=60.3, close=61.0, volume=18000000,
            timestamp="2024-05-01 11:58:00"),
    ]
    df = spark.createDataFrame(brapi + yfin)
    return df.withColumn("timestamp", F.to_timestamp("timestamp"))


def test_micro_batch_enrich_and_merge(spark):
    batch = _feed_batch(spark)
    history = spark.createDataFrame(
        [
            Row(symbol="PETR4", longName="Petrobras PN",
                regularMarketPrice=35.0, regularMarketChange=0.0,
                regularMarketChangePercent=0.0, marketCap=490000000000,
                open=34.0, high=35.5, low=33.9, close=35.0, volume=39000000,
                change_day=1.0, date="2024-04-30 12:00:00",
                sma_5=35.0, sma_20=35.0, turnover_ratio=0.0),
        ]
    ).withColumn("date", F.to_timestamp("date"))
    clock = F.to_timestamp(F.lit("2024-05-01 12:00:00"))
    out = process_micro_batch(batch, history.drop("sma_5", "sma_20", "turnover_ratio"), clock=clock)
    rows = {(r["symbol"], str(r["date"])): r for r in out.collect()}
    # 2 symbols x new batch + 1 history row
    assert len(rows) == 3
    petr_new = rows[("PETR4", "2024-05-01 12:00:00")]
    # snapshot join: brapi _ingest_ts=2 won; yfinance close joined
    assert petr_new["regularMarketPrice"] == 36.5
    assert petr_new["close"] == 36.5
    assert petr_new["change_day"] == 36.5 - 35.8
    # SMA-5 over [35.0 (hist), 36.5] = 35.75 with min_periods=1
    assert math.isclose(petr_new["sma_5"], 35.75)


def test_warehouse_merge_idempotent(spark):
    history = spark.createDataFrame(
        [Row(symbol="A", date=1, close=10.0, volume=100.0, marketCap=1000.0)]
    )
    new = spark.createDataFrame(
        [Row(symbol="A", date=2, close=11.0, volume=110.0, marketCap=1000.0)]
    )
    once = warehouse_merge(history, new, keys=["symbol", "date"])
    twice = warehouse_merge(once.drop("sma_5", "sma_20", "turnover_ratio"), new, keys=["symbol", "date"])
    a = sorted([tuple(r) for r in once.collect()])
    b = sorted([tuple(r) for r in twice.collect()])
    assert a == b


def test_audited_warehouse_rows_match_silent_path(spark):
    """The audited coercion step must be a drop-in for the silent one:
    clean side row-identical to enriched_to_warehouse_rows, and the
    rows the reference silently discards come out annotated with
    exactly the fields that were missing."""
    from b3_analytics_engine_spark.streaming.pipeline import (
        enrich_quotes,
        enriched_to_warehouse_rows,
        enriched_to_warehouse_rows_audited,
    )

    from b3_analytics_engine_spark.schemas import BRAPI_QUOTE, YFINANCE_QUOTE

    batch = _feed_batch(spark)
    brapi_cols = [f.name for f in BRAPI_QUOTE.fields] + ["_ingest_ts"]
    yfin_cols = [f.name for f in YFINANCE_QUOTE.fields]
    brapi = batch.filter(F.col("_feed") == "brapi").select(*brapi_cols)
    yfin = batch.filter(F.col("_feed") == "yfinance").select(*yfin_cols)
    clock = F.to_timestamp(F.lit("2024-05-01 12:00:00"))
    enriched = enrich_quotes(brapi, yfin, clock=clock)
    # sabotage one symbol's close so the silent path drops it
    broken = enriched.withColumn(
        "close", F.when(F.col("symbol") == "VALE3", F.lit(None)).otherwise(F.col("close"))
    )
    silent = enriched_to_warehouse_rows(broken)
    clean, quarantined = enriched_to_warehouse_rows_audited(broken)
    assert sorted(map(tuple, clean.collect())) == sorted(map(tuple, silent.collect()))
    bad = {r["symbol"]: r["failed_rules"] for r in quarantined.collect()}
    assert bad == {"VALE3": "close_present"}


def test_scd2_history_intervalization(spark):
    """SCD2 gaps-and-islands on a literal change feed: consecutive
    repeats collapse, intervals chain [valid_from, valid_to), the
    last version per key is open-ended + flagged current, and a NULL
    value run is handled null-safely (IS DISTINCT FROM, not <>)."""
    import datetime as dt
    import glob
    import os
    import shutil
    import tempfile

    from b3_analytics_engine_spark.queries import registry

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1: A A B B A  -> versions A, B, A
        (0, ts(0), 1, "A", 0.0, "{}"),
        (1, ts(1), 1, "A", 0.0, "{}"),
        (2, ts(2), 1, "B", 0.0, "{}"),
        (3, ts(3), 1, "B", 0.0, "{}"),
        (4, ts(4), 1, "A", 0.0, "{}"),
        # user 2: NULL NULL C -> versions NULL, C
        (5, ts(0), 2, None, 0.0, "{}"),
        (6, ts(1), 2, None, 0.0, "{}"),
        (7, ts(2), 2, "C", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        ev.coalesce(1).write.parquet(os.path.join(td, "tmp"))
        part = glob.glob(os.path.join(td, "tmp", "*.parquet"))[0]
        shutil.move(part, os.path.join(td, "events.parquet"))
        out = registry()["scd2_history"].fn(spark, td).collect()

    u1 = sorted(
        (r for r in out if r["user_id"] == 1), key=lambda r: r["version"]
    )
    assert [r["event_type"] for r in u1] == ["A", "B", "A"]
    assert [r["version"] for r in u1] == [1, 2, 3]
    # intervals chain: each valid_to == next valid_from
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None and u1[2]["is_current"] == 1
    assert all(r["is_current"] == 0 for r in u1[:2])

    u2 = sorted(
        (r for r in out if r["user_id"] == 2), key=lambda r: r["version"]
    )
    assert [r["event_type"] for r in u2] == [None, "C"]
    assert u2[0]["valid_to"] == u2[1]["valid_from"]


def test_anomaly_mad_flags_and_zero_mad_guard(spark):
    """A gross outlier gets |x-med|/MAD > 3.5; a constant-valued
    group has MAD 0 and must yield NULL scores (no div-by-zero) and
    no flags."""
    import datetime as dt
    import glob
    import os
    import shutil
    import tempfile

    from b3_analytics_engine_spark.queries import registry

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # type A: tight cluster around 10 + one far outlier
        *[(i, t0, 1, "A", v, "{}") for i, v in enumerate(
            [9.0, 9.5, 10.0, 10.5, 11.0, 100.0])],
        # type B: constant -> MAD = 0
        *[(10 + i, t0, 1, "B", 5.0, "{}") for i in range(4)],
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        ev.coalesce(1).write.parquet(os.path.join(td, "tmp"))
        part = glob.glob(os.path.join(td, "tmp", "*.parquet"))[0]
        shutil.move(part, os.path.join(td, "events.parquet"))
        out = registry()["anomaly_mad"].fn(spark, td).collect()

    a = {r["event_id"]: r for r in out if r["event_type"] == "A"}
    assert a[5]["is_outlier"] == 1 and a[5]["mad_score"] > 3.5
    assert all(a[i]["is_outlier"] == 0 for i in range(5))
    b = [r for r in out if r["event_type"] == "B"]
    assert all(r["mad_score"] is None and r["is_outlier"] == 0 for r in b)


def test_funnel_conversion_null_user_and_null_ts(spark):
    """r7 advice: the window-funnel rewrite must mirror the oracle's
    NULL semantics — (a) NULL user_id forms a window partition but
    the oracle's equi-joined click/purchase stages drop NULL keys, so
    those stages must stay NULL for it; (b) a user whose every 'view'
    has NULL ts keeps a stage-1 row (GROUP BY retains it), not get
    dropped. Runs the registered Spark query AND its DuckDB oracle on
    a synthetic events fixture exercising both edges."""
    import glob
    import os
    import shutil
    import tempfile

    import duckdb

    from b3_analytics_engine_spark.queries import registry

    def ts(i):
        import datetime as dt

        return dt.datetime(2024, 1, 1, 12, 0, i)

    rows = [
        # user 1: full funnel
        (0, ts(0), 1, "view", 0.0, "{}"),
        (1, ts(1), 1, "click", 0.0, "{}"),
        (2, ts(2), 1, "purchase", 0.0, "{}"),
        # NULL user: view then click — oracle's JOIN ON user_id never
        # matches NULL, so t_click must be NULL, stage 1
        (3, ts(0), None, "view", 0.0, "{}"),
        (4, ts(1), None, "click", 0.0, "{}"),
        # user 3: only a NULL-ts view — stage-1 row with t_view NULL
        (5, None, 3, "view", 0.0, "{}"),
        (6, ts(1), 3, "click", 0.0, "{}"),
        # user 4: click only — no view, absent from output
        (7, ts(0), 4, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    spec = registry()["funnel_conversion"]
    with tempfile.TemporaryDirectory() as td:
        ev.coalesce(1).write.parquet(os.path.join(td, "tmp"))
        part = glob.glob(os.path.join(td, "tmp", "*.parquet"))[0]
        shutil.move(part, os.path.join(td, "events.parquet"))
        got = {
            r["user_id"]: r for r in spec.fn(spark, td).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{os.path.join(td, 'events.parquet')}')"
        )
        want = {r[0]: r for r in con.execute(spec.oracle).fetchall()}

    assert set(got) == set(want) == {1, 3, None}
    assert got[1]["stage_reached"] == want[1][4] == 3
    assert got[None]["t_click"] is None and want[None][2] is None
    assert got[None]["stage_reached"] == want[None][4] == 1
    assert got[3]["t_view"] is None and want[3][1] is None
    assert got[3]["t_click"] is None and want[3][2] is None
    assert got[3]["stage_reached"] == want[3][4] == 1
