"""Event-time windowed aggregations (SURVEY.md §2.9 T8 extension).

The reference has no event-time windows (its only "windows" are
row-count rolling frames), but its micro-batch pipeline is the
motivating shape. These queries are the BATCH expression of the
streaming aggregations in ``streaming/pipeline.py`` — Spark's
``window()`` produces identical results in batch and streaming, so the
DuckDB oracle validates the streaming semantics too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


@register(
    "tumbling_window_agg",
    oracle="""
SELECT CAST(to_timestamp(floor(epoch(ts) / 21600) * 21600) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value,
       floor(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(value)
             * 1000000 + 0.5) / 1000000 AS avg_value
FROM events
GROUP BY 1, 2
""",
    survey="T8 (event-time tumbling window)",
    description="6-hour tumbling event-time window per event_type — "
    "the Structured-Streaming groupBy(window(ts)) aggregation in batch "
    "form. Epoch-aligned buckets match Spark's 1970-origin windows. "
    "Money/metric sums accumulate in DECIMAL(38,6): the per-row "
    "double->decimal cast is engine-identical (binary doubles never "
    "land exactly on a half-ulp decimal boundary), the decimal SUM is "
    "exact in any order, and round() of its double form is boundary-"
    "safe (a <=6dp value scales to within ~1e-4 of an integer). The "
    "AVG is a free quotient, where engine round() implementations "
    "genuinely disagree near ties (Spark rounds the shortest decimal "
    "repr; DuckDB rounds a scaled multiply — measured divergence at "
    "56.4133125, PARITY.md), so it rounds via the portable half-up "
    "floor(q*1e6 + 0.5)/1e6 — every step one IEEE op on identical "
    "inputs, bit-identical in ANY engine at ANY scale. Semantics "
    "documented in PARITY.md: half-up toward +INFINITY (differs from "
    "round() on negative ties) and exact only for |q| < ~9e9 (beyond "
    "that q*1e6 exceeds 2^53) — both edges unreachable here (positive "
    "event-value averages) and parity-safe regardless, since both "
    "engines run the identical expression. Pilot for the "
    "r8 DECIMAL-exact revenue-family pass.",
)
def tumbling_window_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec_sum = F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
    avg_q = dec_sum / F.count("value")
    return (
        ev.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(dec_sum, 6).alias("total_value"),
            (F.floor(avg_q * 1000000 + F.lit(0.5)) / 1000000).alias(
                "avg_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
    )


@register(
    "sliding_window_agg",
    oracle="""
WITH offsets AS (SELECT unnest([0, 3600, 7200]) AS off),
     slid AS (
  SELECT CAST(to_timestamp(floor((epoch(ts) - off) / 10800) * 10800 + off) AS TIMESTAMP) AS window_start,
         value
  FROM events, offsets
  WHERE epoch(ts) >= floor((epoch(ts) - off) / 10800) * 10800 + off
)
SELECT window_start, count(*) AS n_events, round(sum(value), 6) AS total_value
FROM slid
GROUP BY 1
""",
    survey="T8 (sliding window)",
    description="3-hour window sliding every 1 hour — each event lands "
    "in 3 overlapping windows (Spark window(ts, '3 hours', '1 hour')).",
)
def sliding_window_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "3 hours", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "ewma_per_key",
    oracle="""
WITH RECURSIVE ordered AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
), rec AS (
  SELECT user_id, ts, value, rn, value AS ewma FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.ts, o.value, o.rn,
         0.2 * o.value + 0.8 * r.ewma
  FROM ordered o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id, ts, value, round(ewma, 9) AS ewma FROM rec
""",
    survey="ext:stateful-ewma (T7-adjacent custom stateful operator)",
    description="Per-key exponentially-weighted moving average "
    "(alpha=0.2) — the batch twin of the applyInPandasWithState "
    "streaming operator (streaming/stateful.py), which is proven "
    "equal to this recurrence across micro-batch boundaries in "
    "tests. Oracle: recursive-CTE recurrence.",
)
def ewma_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import ewma_batch

    ev = load_table(spark, sf_dir, "events")
    return ewma_batch(ev, alpha=0.2)


@register(
    "stream_stream_join_twin",
    oracle="""
SELECT c.event_id AS click_id, v.user_id AS user_id,
       v.ts AS view_ts, c.ts AS click_ts,
       round(v.value, 6) AS view_value
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND c.event_type = 'click'
""",
    survey="T4 (watermarked stream-stream join, batch twin)",
    description="Batch twin of the idiomatic watermarked stream-stream "
    "join (PARITY.md §T4): views ⋈ clicks per user within 1 hour. "
    "Inner stream-stream joins emit exactly the batch join's rows — "
    "the watermark only bounds STATE, not results — proven by "
    "tests/test_streaming.py::test_stream_stream_watermarked_join_"
    "equals_batch running this same join condition through "
    "withWatermark + append mode. Scale shape matches streaming "
    "state keying: hash equi-join on user_id, the time-range as a "
    "join-stage residual (what the watermark prunes as state at "
    "run time, the range predicate prunes as rows here).",
)
def stream_stream_join_twin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").alias("v")
    clicks = ev.filter(F.col("event_type") == "click").alias("c")
    cond = (
        (F.col("v.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") >= F.col("v.ts"))
        & (F.col("c.ts") <= F.col("v.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return views.join(clicks, cond, "inner").select(
        F.col("c.event_id").alias("click_id"),
        F.col("v.user_id").alias("user_id"),
        F.col("v.ts").alias("view_ts"),
        F.col("c.ts").alias("click_ts"),
        F.round("v.value", 6).alias("view_value"),
    )


@register(
    "json_payload_parse",
    oracle="""
SELECT event_id, user_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
""",
    survey="F5 F6 S2",
    description="Kafka-value JSON parse path: from_json with explicit "
    "schema (the reference parses every consumed message, "
    "include/tasks/data_processing.py:14).",
)
def json_payload_parse_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..schemas import EVENT_PROPS

    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("_p", F.from_json("props", EVENT_PROPS))
    return parsed.select(
        "event_id",
        "user_id",
        F.col("_p.k").alias("k"),
        F.when(F.col("_p.k") >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "time_rollup_hierarchy",
    oracle="""
SELECT user_id,
       CAST(ts AS DATE) AS day,
       CAST(strftime(ts, '%H') AS BIGINT) AS hour,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value,
       round(avg(value), 6) AS avg_value,
       CASE WHEN CAST(strftime(ts, '%H') AS BIGINT) IS NULL THEN 1 ELSE 0 END
         + CASE WHEN CAST(ts AS DATE) IS NULL THEN 1 ELSE 0 END AS rollup_level
FROM events
GROUP BY ROLLUP (user_id, CAST(ts AS DATE), CAST(strftime(ts, '%H') AS BIGINT))
HAVING user_id IS NOT NULL
""",
    survey="ext:hypertable-rollup (A7 grouping-hierarchy)",
    description="Hypertable-style multi-resolution rollup: hourly, "
    "daily, and per-key totals from ONE scan via ROLLUP(user, day, "
    "hour) — the batch twin of a TimescaleDB continuous aggregate. "
    "Spark computes all three grain levels with a single shuffle "
    "(Expand + partial agg); at 100 TB this replaces three separate "
    "passes over the fact table. rollup_level disambiguates grains "
    "(0=hourly, 1=daily, 2=key total) since day/hour are NULL at "
    "coarser levels.",
)
def time_rollup_hierarchy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    hour = F.date_format("ts", "HH").cast("long").alias("hour")
    out = (
        ev.rollup(F.col("user_id"), day, hour)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .filter(F.col("user_id").isNotNull())
    )
    level = (
        F.when(F.col("hour").isNull(), 1).otherwise(0)
        + F.when(F.col("day").isNull(), 1).otherwise(0)
    )
    return out.select(
        "user_id", "day", "hour", "n_events", "total_value", "avg_value",
        level.alias("rollup_level"),
    )
