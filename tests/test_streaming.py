"""Streaming-layer tests, broker-free (SURVEY.md §5.4):

- a file-source stream through a windowed event-time aggregation in a
  memory sink equals the same aggregation run in batch (Spark
  guarantees it; this pins OUR query shapes to that guarantee);
- the E2 foreachBatch pipeline via start_incremental over a real
  stream source, AvailableNow trigger, checkpointed;
- replaying the same micro-batch is a no-op (idempotent merge).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from b3_analytics_engine_spark.schemas import FIXTURE_SCHEMAS
from b3_analytics_engine_spark.sources.files import stream_parquet_dir
from b3_analytics_engine_spark.tables import SMOKE_SF_DIR, load_table

from conftest import local_df


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="b3stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_window_agg_equals_batch(spark, tmpdir):
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    src = f"{tmpdir}/src"
    # two files → two micro-batches
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(f"{src}/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(f"{src}/b.parquet")

    schema = ev.schema
    # maxFilesPerTrigger=1 so availableNow really runs one micro-batch
    # per file — without it both files fold into a single batch and the
    # cross-batch stream-equals-batch property is not exercised.
    stream = stream_parquet_dir(spark, f"{src}/*", schema, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_agg")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r["window"]["start"]), r["event_type"]): (r["n"], r["v"])
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    want = {
        (str(r["window"]["start"]), r["event_type"]): (r["n"], r["v"])
        for r in (
            ev.groupBy(F.window("ts", "6 hours"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v"))
            .collect()
        )
    }
    assert got == want


def _write_feed_files(spark, src: str):
    """Split sf0.001 events into a two-feed tagged stream fixture:
    purchases play 'brapi', clicks play 'yfinance' (FIXTURES.md §C)."""
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    brapi = ev.filter(F.col("event_type") == "purchase").select(
        F.lit("brapi").alias("_feed"),
        F.concat(F.lit("U"), F.col("user_id").cast("string")).alias("symbol"),
        F.lit("Long Name").alias("longName"),
        F.col("value").alias("regularMarketPrice"),
        F.lit(0.0).alias("regularMarketChange"),
        F.lit(0.0).alias("regularMarketChangePercent"),
        (F.col("user_id") * 1000000).alias("marketCap"),
        F.col("event_id").alias("_ingest_ts"),
        F.lit(None).cast("double").alias("open"),
        F.lit(None).cast("double").alias("high"),
        F.lit(None).cast("double").alias("low"),
        F.lit(None).cast("double").alias("close"),
        F.lit(None).cast("long").alias("volume"),
        F.lit(None).cast("timestamp").alias("timestamp"),
    )
    yfin = ev.filter(F.col("event_type") == "click").select(
        F.lit("yfinance").alias("_feed"),
        F.concat(F.lit("U"), F.col("user_id").cast("string"), F.lit(".SA")).alias(
            "symbol"
        ),
        F.lit(None).cast("string").alias("longName"),
        F.lit(None).cast("double").alias("regularMarketPrice"),
        F.lit(None).cast("double").alias("regularMarketChange"),
        F.lit(None).cast("double").alias("regularMarketChangePercent"),
        F.lit(None).cast("long").alias("marketCap"),
        F.lit(None).cast("long").alias("_ingest_ts"),
        (F.col("value") * 0.99).alias("open"),
        (F.col("value") * 1.01).alias("high"),
        (F.col("value") * 0.98).alias("low"),
        F.col("value").alias("close"),
        (F.col("value") * 1000).cast("long").alias("volume"),
        F.col("ts").alias("timestamp"),
    )
    tagged = brapi.unionByName(yfin)
    tagged.write.parquet(f"{src}/batch1.parquet")
    return tagged


def test_incremental_stream_end_to_end(spark, tmpdir):
    from b3_analytics_engine_spark.streaming.pipeline import start_incremental

    src = f"{tmpdir}/feeds"
    tagged = _write_feed_files(spark, src)
    stream = stream_parquet_dir(spark, f"{src}/*", tagged.schema)
    wh = f"{tmpdir}/warehouse"
    q = start_incremental(
        spark,
        stream,
        warehouse_path=wh,
        checkpoint=f"{tmpdir}/ckpt",
    )
    q.awaitTermination(180)

    out = spark.read.parquet(wh)
    assert out.count() > 0
    cols = set(out.columns)
    assert {"symbol", "date", "close", "sma_5", "sma_20", "turnover_ratio"} <= cols
    # no feed-plumbing columns may leak into the warehouse
    assert "_feed" not in cols and "_ingest_ts" not in cols and "_src_priority" not in cols
    # snapshot semantics: exactly one row per (symbol, date)
    dupes = (
        out.groupBy("symbol", "date").count().filter(F.col("count") > 1).count()
    )
    assert dupes == 0


def test_incremental_stream_recovers_midswap_parked_warehouse(spark, tmpdir):
    """T5 crash contract: a kill between the warehouse swap's two
    renames leaves the ONLY copy of the history parked at
    ``warehouse__old`` with the live path missing. The restarted
    stream's next micro-batch must restore it BEFORE its history read
    — the pre-fix path read PATH_NOT_FOUND, took the first-run
    branch, rebuilt the warehouse from that single micro-batch, and
    the swap then swept the parked history as a stale leftover:
    silent, permanent loss of the whole table."""
    import os

    from b3_analytics_engine_spark.streaming.pipeline import start_incremental

    src = f"{tmpdir}/feeds"
    tagged = _write_feed_files(spark, src)
    wh, ckpt = f"{tmpdir}/warehouse", f"{tmpdir}/ckpt"
    q = start_incremental(
        spark,
        stream_parquet_dir(spark, f"{src}/*", tagged.schema),
        warehouse_path=wh,
        checkpoint=ckpt,
    )
    q.awaitTermination(180)
    before = {
        (r["symbol"], r["date"])
        for r in spark.read.parquet(wh).select("symbol", "date").collect()
    }
    assert before

    os.rename(wh, wh + "__old")  # the mid-swap crash state

    # a SMALLER second batch arrives (one symbol): under the bug the
    # restarted warehouse would hold only this symbol's rows
    b1 = spark.read.parquet(f"{src}/batch1.parquet")
    sym = b1.filter(F.col("_feed") == "brapi").select("symbol").first()[0]
    b1.filter(
        (F.col("symbol") == sym) | (F.col("symbol") == sym + ".SA")
    ).write.parquet(f"{src}/batch2.parquet")

    q2 = start_incremental(
        spark,
        stream_parquet_dir(spark, f"{src}/*", tagged.schema),
        warehouse_path=wh,
        checkpoint=ckpt,
    )
    q2.awaitTermination(180)

    after = {
        (r["symbol"], r["date"])
        for r in spark.read.parquet(wh).select("symbol", "date").collect()
    }
    assert before <= after, (
        f"history lost: {len(before - after)} of {len(before)} "
        "(symbol, date) keys vanished across the crash-restart"
    )
    assert not os.path.exists(wh + "__old")


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmpdir):
    """T3: watermarked dropDuplicates — the streaming-native form of
    the reference's downstream idempotence. The same events arrive in
    two micro-batches; the sink must see each event_id once."""
    ev = load_table(spark, SMOKE_SF_DIR, "events").limit(200)
    src = f"{tmpdir}/src"
    ev.coalesce(1).write.parquet(f"{src}/a.parquet")
    ev.coalesce(1).write.parquet(f"{src}/b.parquet")  # exact replay

    stream = stream_parquet_dir(spark, f"{src}/*", ev.schema)
    deduped = stream.withWatermark("ts", "30 days").dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").collect()[0]
    assert got["n"] == got["d"] == 200


def test_watermark_append_semantics(spark, tmpdir):
    """T5/T8: event-time watermark + append-mode guarantees — each
    window is emitted EXACTLY ONCE after the watermark passes it, with
    all its on-time events.

    (Observed on Spark 4.1: a 1.4h-late event past a 1h watermark was
    still admitted and emitted — the "drop data older than watermark"
    direction is best-effort per the Structured Streaming docs; only
    never-dropping on-time data and once-only append emission are
    guaranteed, so those are what this test pins.)"""
    import time as _time

    from pyspark.sql import Row

    schema = "user_id long, ts timestamp, value double"
    b1 = local_df(spark, 
        [
            Row(user_id=1, ts="2024-05-01 10:05:00", value=1.0),
            Row(user_id=1, ts="2024-05-01 10:50:00", value=2.0),
            Row(user_id=1, ts="2024-05-01 11:55:00", value=3.0),
        ]
    ).withColumn("ts", F.to_timestamp("ts"))
    b2 = local_df(spark, 
        [
            # 09:30 is > 1h older than the watermark set by batch 1
            # (10:55) → must be dropped, its window never emitted
            Row(user_id=1, ts="2024-05-01 09:30:00", value=99.0),
            Row(user_id=1, ts="2024-05-01 12:40:00", value=4.0),
        ]
    ).withColumn("ts", F.to_timestamp("ts"))

    src = f"{tmpdir}/src"
    b1.coalesce(1).write.parquet(f"{src}/a.parquet")
    _time.sleep(1.2)  # file-source orders micro-batches by mod time
    b2.coalesce(1).write.parquet(f"{src}/b.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    all_rows = spark.sql("SELECT * FROM late_out").collect()
    starts = [str(r["window"]["start"]) for r in all_rows]
    # append mode: every finalized window emitted exactly once
    assert len(starts) == len(set(starts)), f"duplicate window emission: {starts}"
    rows = {str(r["window"]["start"]): (r["n"], r["v"]) for r in all_rows}
    # the 10:00 window finalized with exactly its on-time events
    assert rows.get("2024-05-01 10:00:00") == (2, 3.0)
    # the still-open 12:00 window (12:40 event) must NOT be emitted yet
    assert "2024-05-01 12:00:00" not in rows


def test_warehouse_replay_is_noop(spark):
    """T3: replaying a micro-batch must not change the table (the
    idempotence the reference gets from keep-last dedup)."""
    from pyspark.sql import Row

    from b3_analytics_engine_spark.streaming.pipeline import warehouse_merge

    history = local_df(spark, 
        [Row(symbol="A", date=1, close=10.0, volume=100.0, marketCap=1000.0)]
    )
    batch = local_df(spark, 
        [Row(symbol="A", date=2, close=12.0, volume=90.0, marketCap=1000.0)]
    )
    t1 = warehouse_merge(history, batch, keys=["symbol", "date"])
    base = t1.drop("sma_5", "sma_20", "turnover_ratio")
    t2 = warehouse_merge(base, batch, keys=["symbol", "date"])
    assert sorted(map(tuple, t1.collect())) == sorted(map(tuple, t2.collect()))


def test_stream_stream_watermarked_join_equals_batch(spark, tmpdir):
    """SURVEY §2.9 T4, idiomatic alternative: two event-time streams
    inner-joined with watermarks + a bounded time-range condition
    (clicks ⋈ views within 1 hour). Append-mode stream-stream join
    must emit exactly the rows the identical batch join produces."""
    ev = load_table(spark, SMOKE_SF_DIR, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("value").alias("view_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    cond_sql = (
        "views.user_id = clicks.user_id AND "
        "click_ts >= view_ts AND click_ts <= view_ts + INTERVAL 1 HOUR"
    )

    vsrc, csrc = f"{tmpdir}/views", f"{tmpdir}/clicks"
    views.filter(F.col("user_id") % 2 == 0).write.parquet(f"{vsrc}/a.parquet")
    views.filter(F.col("user_id") % 2 == 1).write.parquet(f"{vsrc}/b.parquet")
    clicks.write.parquet(f"{csrc}/a.parquet")

    vs = stream_parquet_dir(spark, f"{vsrc}/*", views.schema).alias("views")
    cs = stream_parquet_dir(spark, f"{csrc}/*", clicks.schema).alias("clicks")
    joined = (
        vs.withWatermark("view_ts", "2 hours")
        .join(
            cs.withWatermark("click_ts", "2 hours"),
            F.expr(cond_sql),
            "inner",
        )
        .select("click_id", F.col("views.user_id").alias("user_id"),
                "view_ts", "click_ts", "view_value")
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", f"{tmpdir}/ckpt_ssj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        tuple(r) for r in spark.sql(
            "SELECT click_id, user_id, view_ts, click_ts, view_value FROM ss_join"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in views.alias("views")
        .join(clicks.alias("clicks"), F.expr(cond_sql), "inner")
        .select("click_id", F.col("views.user_id").alias("user_id"),
                "view_ts", "click_ts", "view_value")
        .collect()
    )
    assert len(want) > 0, "fixture produced no view→click pairs"
    assert got == want


def test_streaming_text_curation_equals_batch(spark, tmpdir):
    """The curation operators are plain DataFrame→DataFrame functions,
    so the same quality/lang filter runs unchanged inside a document
    stream — micro-batched corpus curation must emit exactly the rows
    the batch pipeline keeps (dedup excluded: cross-batch dedup is the
    warehouse-merge/foreachBatch path, tested separately)."""
    from pyspark.sql import functions as F  # noqa: F811

    from b3_analytics_engine_spark.operators import text as TX

    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    src = f"{tmpdir}/docs"
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{src}/a.parquet")
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{src}/b.parquet")

    def curate(df):
        c = F.col("text")
        return (
            df.select(
                "doc_id",
                F.round(TX.quality_score(c), 6).alias("quality_score"),
                TX.lang_id(c).alias("lang_guess"),
            )
            .filter((F.col("lang_guess") != "und") & (F.col("quality_score") >= 0.5))
        )

    stream = stream_parquet_dir(spark, f"{src}/*", docs.schema)
    q = (
        curate(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("curated_stream")
        .option("checkpointLocation", f"{tmpdir}/ckpt_cur")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM curated_stream").collect()
    )
    want = sorted(tuple(r) for r in curate(docs).collect())
    assert len(want) > 0
    assert got == want


def test_transform_with_state_builds_plan(spark, tmpdir):
    """transformWithStateInPandas plumbing is real even where the
    protobuf state protocol can't run: the operator builds a streaming
    DataFrame with the declared output schema."""
    from b3_analytics_engine_spark.streaming.stateful import (
        running_totals_stream,
    )

    schema = (
        load_table(spark, SMOKE_SF_DIR, "events")
        .select("event_id", "user_id", "value")
        .schema
    )
    out = running_totals_stream(
        stream_parquet_dir(spark, f"{tmpdir}/*", schema)
    )
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n", "total", "vmin", "vmax", "vmean",
    ]


def test_transform_with_state_running_totals_equals_batch(spark, tmpdir):
    """transformWithStateInPandas (Spark 4 arbitrary-state API): after
    draining the stream, the last emitted row per key equals the batch
    groupBy aggregate over all data — state carries correctly across
    micro-batches and the RocksDB store round-trips the value schema.

    The state-server protocol needs the protobuf package on the driver
    (pyspark[sql] extra); skipped where it isn't installed.
    """
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState state protocol requires protobuf",
    )
    from b3_analytics_engine_spark.streaming.stateful import (
        running_totals_stream,
    )

    ev = load_table(spark, SMOKE_SF_DIR, "events").select("event_id", "user_id", "value")
    src = f"{tmpdir}/src"
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(f"{src}/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(f"{src}/b.parquet")

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = stream_parquet_dir(
            spark,
            f"{src}/*",
            load_table(spark, SMOKE_SF_DIR, "events")
            .select("event_id", "user_id", "value")
            .schema,
            max_files_per_trigger=1,
        )
        q = (
            running_totals_stream(stream)
            .writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            # memory sink in update mode appends every emitted row; the
            # LAST row per key (largest n) is the final state
            """
            SELECT user_id, n, total, vmin, vmax, vmean FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n DESC) AS rn
              FROM running_totals) WHERE rn = 1
            """
        ).collect()
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )

    want = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.avg("value").alias("vmean"),
        )
        .collect()
    }
    assert len(got) == len(want)
    for r in got:
        w = want[r["user_id"]]
        assert r["n"] == w["n"] and r["vmin"] == w["vmin"] and r["vmax"] == w["vmax"]
        assert r["total"] == pytest.approx(w["total"], rel=1e-12)
        assert r["vmean"] == pytest.approx(w["vmean"], rel=1e-12)


def test_streaming_session_window_equals_batch(spark, tmpdir):
    """T8 extension, session flavor: Spark's built-in session_window
    (dynamic gap-merged event-time windows, stateful merge across
    micro-batches) over a 2-batch stream equals the same aggregation
    in batch mode."""
    ev = load_table(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    src = f"{tmpdir}/src"
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(f"{src}/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(f"{src}/b.parquet")

    def sessionize(df):
        return df.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v"))

    stream = stream_parquet_dir(
        spark, f"{src}/*", ev.schema, max_files_per_trigger=1
    )
    q = (
        sessionize(stream.withWatermark("ts", "10 days"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_win")
        .option("checkpointLocation", f"{tmpdir}/ckpt_sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def canon(rows):
        return sorted(
            (str(r["sw"]["start"]), str(r["sw"]["end"]), r["user_id"], r["n"], r["v"])
            for r in rows
        )

    got = canon(spark.sql("SELECT * FROM sess_win").collect())
    want = canon(sessionize(ev).collect())
    assert got == want and len(got) > 0


def test_checkpoint_recovery_resumes_not_reprocesses(spark, tmpdir):
    """Kill-and-restart durability: a windowed aggregation stream is
    run to completion, stopped, MORE data arrives, and a NEW query
    started from the same checkpoint picks up only the new files —
    final state equals the batch answer over everything (exactly-once
    across restarts, the guarantee the reference's fresh-group-id
    re-read hack approximates by reprocessing the world every minute)."""
    ev = load_table(spark, SMOKE_SF_DIR, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src = f"{tmpdir}/src"
    ckpt = f"{tmpdir}/ckpt_recover"
    first = ev.filter(F.col("event_id") % 3 != 0)
    second = ev.filter(F.col("event_id") % 3 == 0)
    first.coalesce(1).write.parquet(f"{src}/batch1.parquet")

    def start():
        stream = stream_parquet_dir(spark, f"{src}/*", ev.schema)
        agg = (
            stream.withWatermark("ts", "10 days")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("recover_out")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start()
    q1.awaitTermination(120)
    n_after_first = spark.sql(
        "SELECT sum(n) AS s FROM recover_out"
    ).collect()[0]["s"]
    assert n_after_first == first.count()

    second.coalesce(1).write.parquet(f"{src}/batch2.parquet")
    q2 = start()  # same checkpoint: resumes, does not re-read batch1
    q2.awaitTermination(120)
    # exactly one availableNow batch processed the single new file
    assert q2.lastProgress["numInputRows"] <= second.count()

    got = {
        (str(r["w"]["start"]), r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM recover_out").collect()
    }
    want = {
        (str(r["w"]["start"]), r["event_type"]): r["n"]
        for r in ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
