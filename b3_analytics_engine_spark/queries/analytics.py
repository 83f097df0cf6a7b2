"""Analytics queries: the reference's warehouse-metrics pipeline and
dashboard/report queries, re-expressed over the driver's ``events``
fixture (events ≈ quote stream: user_id ≈ symbol, ts ≈ event time,
value ≈ price — FIXTURES.md §C).

Covers SURVEY.md §2.5 (W1-W5), §2.4 (A2-A7), §2.3 (J4), §2.6 (O1-O4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import windows as W
from ..operators.aggregates import corr_matrix, distinct_sorted, top_k_global
from ..operators.common import materialize
from ..operators.joins import hint_small, latest_per_key, pivot_wide
from ..tables import load_table
from . import register

# ---------------------------------------------------------------------------
# Flagship: the E2-condensed warehouse pipeline (daily bars → rolling
# metrics), the reference's calculate_metrics + report analytics
# (reference include/tasks/data_warehouse.py:10-27,
#  include/tasks/generate_dashboard.py:25-36) on the events fixture.
# ---------------------------------------------------------------------------


def daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, day) OHLC-style bars. ``close`` = value at the max ts
    of the day (max_by — map-side combinable, one shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.max_by("value", "ts").alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.sum("value").alias("volume"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "warehouse_metrics",
    oracle="""
WITH bars AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         arg_max(value, ts) AS close,
         max(value) AS high,
         min(value) AS low,
         sum(value) AS volume,
         count(*) AS n_events
  FROM events
  GROUP BY 1, 2
), ret AS (
  SELECT *,
         avg(close) OVER w5  AS sma5_raw,
         avg(close) OVER w20 AS sma20_raw,
         close / lag(close) OVER wo - 1 AS ret_raw,
         volume * close / avg(volume) OVER (PARTITION BY user_id) AS turn_raw
  FROM bars
  WINDOW
    wo  AS (PARTITION BY user_id ORDER BY day),
    w5  AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
    w20 AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT user_id, day, close, high, low,
       round(volume, 6) AS volume,
       n_events,
       round(sma5_raw, 6)  AS sma_5,
       round(sma20_raw, 6) AS sma_20,
       round(ret_raw, 6)   AS daily_return,
       CASE WHEN ret_raw IS NULL THEN NULL
            ELSE round(product(1 + ret_raw) OVER
                 (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1, 6)
       END AS cumulative_return,
       round(turn_raw, 6) AS turnover_ratio
FROM ret
""",
    survey="W1 W2 W3 W4 W5 A2 P10 O1",
    description="Flagship: daily bars → SMA-5/20, daily & cumulative "
    "returns, turnover ratio per key (reference warehouse metrics "
    "pipeline, include/tasks/data_warehouse.py:10-27 + "
    "include/tasks/generate_dashboard.py:25-36).",
)
def warehouse_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = daily_bars(spark, sf_dir)
    df = W.rolling_mean(bars, "close", "user_id", "day", 5, "sma_5")
    df = W.rolling_mean(df, "close", "user_id", "day", 20, "sma_20")
    df = W.pct_change(df, "close", "user_id", "day", "daily_return")
    df = W.cumulative_return(df, "daily_return", "user_id", "day", "cumulative_return")
    avg_vol = Window.partitionBy("user_id")
    df = df.withColumn(
        "turnover_ratio",
        F.try_divide(
            F.col("volume") * F.col("close"), F.avg("volume").over(avg_vol)
        ),
    )
    return df.select(
        "user_id",
        "day",
        "close",
        "high",
        "low",
        F.round("volume", 6).alias("volume"),
        "n_events",
        F.round("sma_5", 6).alias("sma_5"),
        F.round("sma_20", 6).alias("sma_20"),
        F.round("daily_return", 6).alias("daily_return"),
        F.round("cumulative_return", 6).alias("cumulative_return"),
        F.round("turnover_ratio", 6).alias("turnover_ratio"),
    )


@register(
    "latest_per_key",
    oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    survey="A2 J1",
    description="Latest row per key — the dict-overwrite snapshot "
    "semantics of the two-feed join build side (reference "
    "include/tasks/data_processing.py:47-56; dashboard latest-per-"
    "symbol analytics_service/dashboard.py:109).",
)
def latest_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return latest_per_key(ev, "user_id", "ts", tiebreak="event_id")


@register(
    "snapshot_join",
    oracle="""
WITH purchases AS (
  SELECT user_id, arg_max(value, ts) AS last_purchase_value,
         max(ts) AS last_purchase_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), clicks AS (
  SELECT user_id, arg_max(value, ts) AS last_click_value,
         max(ts) AS last_click_ts
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT p.user_id, p.last_purchase_value, p.last_purchase_ts,
       c.last_click_value, c.last_click_ts,
       round(p.last_purchase_value - c.last_click_value, 6) AS change_day
FROM purchases p JOIN clicks c ON p.user_id = c.user_id
""",
    survey="J1 J2 T4 P10",
    description="Two-feed snapshot join: latest-per-key on each feed "
    "then inner equi-join + derived change column (reference "
    "include/tasks/data_processing.py:44-83, the brapi⋈yfinance "
    "enrichment). No broadcast hint: both sides are per-user "
    "aggregates whose size is O(distinct users) — unbounded at "
    "scale — so AQE picks the strategy from runtime stats (broadcast "
    "when a side is genuinely small, shuffle-hash otherwise).",
)
def snapshot_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max_by("value", "ts").alias("last_purchase_value"),
            F.max("ts").alias("last_purchase_ts"),
        )
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.max_by("value", "ts").alias("last_click_value"),
            F.max("ts").alias("last_click_ts"),
        )
    )
    return purchases.join(clicks, "user_id", "inner").select(
        "user_id",
        "last_purchase_value",
        "last_purchase_ts",
        "last_click_value",
        "last_click_ts",
        F.round(
            F.col("last_purchase_value") - F.col("last_click_value"), 6
        ).alias("change_day"),
    )


@register(
    "union_dedup_keeplast",
    oracle="""
WITH unioned AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value, 0 AS _src_priority, event_id
  FROM events
  UNION ALL
  SELECT user_id, CAST(ts AS DATE) AS day, value * 2 AS value, 1 AS _src_priority, event_id
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, day, value, _src_priority
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, day
    ORDER BY _src_priority DESC, event_id DESC
  ) AS rn
  FROM unioned
) WHERE rn = 1
""",
    survey="J3 A1",
    description="History ∪ new-batch with deterministic keep-last "
    "dedup via explicit source priority (reference "
    "include/tasks/data_warehouse.py:73-74 concat + "
    "drop_duplicates(keep='last') made order-independent).",
)
def union_dedup_keeplast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import keep_last_dedup
    from ..operators.joins import union_history

    ev = load_table(spark, sf_dir, "events")
    history = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "value",
        F.lit(0).alias("_src_priority"),
        "event_id",
    )
    new_batch = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.to_date("ts").alias("day"),
            (F.col("value") * 2).alias("value"),
            F.lit(1).alias("_src_priority"),
            "event_id",
        )
    )
    merged = union_history(history, new_batch)
    deduped = keep_last_dedup(
        merged,
        keys=["user_id", "day"],
        priority=[F.col("_src_priority"), F.col("event_id")],
    )
    return deduped.select("user_id", "day", "value", "_src_priority")


@register(
    "pivot_daily_mean",
    oracle="""
SELECT CAST(ts AS DATE) AS day,
       round(avg(value) FILTER (WHERE user_id % 5 = 0), 6) AS u0,
       round(avg(value) FILTER (WHERE user_id % 5 = 1), 6) AS u1,
       round(avg(value) FILTER (WHERE user_id % 5 = 2), 6) AS u2,
       round(avg(value) FILTER (WHERE user_id % 5 = 3), 6) AS u3,
       round(avg(value) FILTER (WHERE user_id % 5 = 4), 6) AS u4
FROM events
GROUP BY 1
""",
    survey="J4 A6",
    description="Long→wide pivot of per-day mean value by key bucket "
    "(reference include/tasks/generate_dashboard.py:52 pivot for the "
    "correlation matrix input).",
)
def pivot_daily_mean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    long = ev.groupBy(
        F.to_date("ts").alias("day"), (F.col("user_id") % 5).alias("bucket")
    ).agg(F.avg("value").alias("mean_value"))
    wide = (
        long.groupBy("day")
        .pivot("bucket", [0, 1, 2, 3, 4])
        .agg(F.first("mean_value"))
    )
    return wide.select(
        "day",
        *[F.round(F.col(str(i)), 6).alias(f"u{i}") for i in range(5)],
    )


@register(
    "corr_matrix",
    oracle="""
WITH wide AS (
  SELECT CAST(ts AS DATE) AS day,
         avg(value) FILTER (WHERE user_id % 3 = 0) AS s0,
         avg(value) FILTER (WHERE user_id % 3 = 1) AS s1,
         avg(value) FILTER (WHERE user_id % 3 = 2) AS s2
  FROM events GROUP BY 1
)
SELECT col_a, col_b, round(corr_val, 6) AS corr
FROM (
  SELECT 's0' col_a, 's0' col_b, corr(s0, s0) corr_val FROM wide UNION ALL
  SELECT 's0', 's1', corr(s0, s1) FROM wide UNION ALL
  SELECT 's0', 's2', corr(s0, s2) FROM wide UNION ALL
  SELECT 's1', 's0', corr(s1, s0) FROM wide UNION ALL
  SELECT 's1', 's1', corr(s1, s1) FROM wide UNION ALL
  SELECT 's1', 's2', corr(s1, s2) FROM wide UNION ALL
  SELECT 's2', 's0', corr(s2, s0) FROM wide UNION ALL
  SELECT 's2', 's1', corr(s2, s1) FROM wide UNION ALL
  SELECT 's2', 's2', corr(s2, s2) FROM wide
)
""",
    survey="A5 J4",
    description="Pairwise Pearson correlation matrix over pivoted "
    "per-key daily means (reference include/tasks/"
    "generate_dashboard.py:52-53 returns_df.corr()), computed in ONE "
    "aggregation pass.",
)
def corr_matrix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    long = ev.groupBy(
        F.to_date("ts").alias("day"), (F.col("user_id") % 3).alias("bucket")
    ).agg(F.avg("value").alias("mean_value"))
    wide = pivot_wide(long, "day", "bucket", "mean_value", [0, 1, 2]).select(
        "day",
        *[F.col(str(i)).alias(f"s{i}") for i in range(3)],
    )
    return corr_matrix(wide, ["s0", "s1", "s2"], round_to=6)


@register(
    "top1_by_metric",
    oracle="""
SELECT user_id, event_id, value, abs_change
FROM (
  SELECT user_id, event_id, value,
         round(abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)), 6) AS abs_change
  FROM events
)
WHERE abs_change IS NOT NULL
ORDER BY abs_change DESC, event_id ASC
LIMIT 1
""",
    survey="A3 O4 P12",
    description="Whole-frame argmax (largest absolute move) — the "
    "dashboard 'largest move' tile (reference analytics_service/"
    "dashboard.py:158 idxmax over change_day.abs()). Compiles to "
    "TakeOrderedAndProject (per-partition top-k), not a global sort.",
)
def top1_by_metric_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_change = ev.withColumn(
        "abs_change", F.round(F.abs(F.col("value") - F.lag("value").over(w)), 6)
    ).filter(F.col("abs_change").isNotNull())
    return (
        with_change.orderBy(F.col("abs_change").desc(), F.col("event_id").asc())
        .limit(1)
        .select("user_id", "event_id", "value", "abs_change")
    )


@register(
    "distinct_sorted_keys",
    oracle="SELECT DISTINCT user_id FROM events ORDER BY user_id",
    survey="A4",
    description="Distinct + sort over the key domain (reference "
    "analytics_service/dashboard.py:73 sorted(unique())).",
)
def distinct_sorted_keys_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_sorted(load_table(spark, sf_dir, "events"), "user_id")


@register(
    "group_share",
    oracle="""
SELECT user_id,
       round(sum(value), 6) AS total_value,
       round(100.0 * sum(value) / (SELECT sum(value) FROM events), 6) AS pct_share
FROM events
GROUP BY user_id
""",
    survey="A7 F7",
    description="Group totals + percent-of-whole (reference market-cap "
    "pie: analytics_service/dashboard.py:147-152 sum + autopct).",
)
def group_share_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(F.sum("value").alias("total_value"))
    grand = ev.agg(F.sum("value").alias("grand")).select("grand")
    return (
        totals.crossJoin(hint_small(grand))
        .select(
            "user_id",
            F.round("total_value", 6).alias("total_value"),
            F.round(
                F.try_divide(F.lit(100.0) * F.col("total_value"), F.col("grand")), 6
            ).alias("pct_share"),
        )
    )


@register(
    "gap_fill_forward",
    oracle="""
WITH ranked AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         row_number() OVER (
           PARTITION BY user_id, CAST(ts AS DATE)
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
), daily AS (
  SELECT user_id, day, round(value, 6) AS close FROM ranked WHERE rn = 1
), span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
), cal AS (
  SELECT user_id,
         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
), j AS (
  SELECT c.user_id, c.day, d.close
  FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
)
SELECT user_id, day, close,
       last_value(close IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_close,
       CASE WHEN close IS NULL THEN 1 ELSE 0 END AS is_gap
FROM j
""",
    survey="ext:timeseries-gapfill (W-family)",
    description="Calendar gap-fill + forward fill: per-key daily "
    "closes densified onto a generated per-key calendar (sequence + "
    "explode), missing days carried forward with last(ignorenulls) — "
    "the standard quote-series regularization the reference's rolling "
    "metrics implicitly assume (its SMA windows are row-count frames; "
    "a gap-filled series makes row frames ≡ time frames). The "
    "calendar explode is per-key bounded (span days), the fill one "
    "window scan — no driver loops at any scale.",
)
def gap_fill_forward_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wday = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.select("user_id", F.to_date("ts").alias("day"), "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(wday))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.round("value", 6).alias("close"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = cal.join(daily, ["user_id", "day"], "left")
    wfill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "day",
        "close",
        F.last("close", ignorenulls=True).over(wfill).alias("filled_close"),
        F.when(F.col("close").isNull(), 1).otherwise(0).alias("is_gap"),
    )


@register(
    "cohort_retention",
    oracle="""
WITH first_day AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY 1
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT f.cohort_day,
       datediff('day', f.cohort_day, a.day) AS day_offset,
       count(*) AS active_users
FROM activity a
JOIN first_day f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
    survey="ext:cohort-retention (A2 A7)",
    description="Cohort retention matrix: first-seen day per key "
    "(cohort) × activity-day offset → active-user counts — the "
    "standard engagement rollup. Two aggregations over the same "
    "distinct-activity base; the cohort map joins back on user_id "
    "(AQE picks broadcast when it fits).",
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    first_day = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(first_day, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "funnel_conversion",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY 1
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
         + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS stage_reached
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
""",
    survey="ext:funnel (A2 J1 ordered-sequence)",
    description="Ordered funnel analysis: first view, first click "
    "AFTER that view, first purchase AFTER that click — per-user "
    "stage timestamps and depth reached. Three progressively-"
    "filtered aggregations; each stage output is one row per "
    "surviving user, so the joins shrink monotonically — the "
    "standard product-analytics sequence query at any scale.",
)
def funnel_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stacked per-user window aggregates, each stage's condition
    # referencing the previous stage's window column: Spark compiles
    # the three Window nodes over ONE hash exchange on user_id, so
    # the whole funnel is a single events scan + single shuffle. The
    # r6 shape (three progressively-joined aggregations) replayed
    # the events scan 6x because each stage's subplan embeds the
    # previous ones and their exchanges hash on different outputs
    # (scan_audit.py finding, r7). A click before the first view
    # yields NULL in `ts > t_view` -> excluded from the min, exactly
    # the oracle's join-filter semantics. Two NULL edges mirrored
    # from the oracle (r7 advice): the window treats NULL user_id as
    # one partition where the oracle's equi-joins drop NULL keys, so
    # the click/purchase stages require user_id IS NOT NULL (the
    # t_view row itself survives — GROUP BY keeps the NULL group);
    # and a user whose every 'view' has NULL ts keeps a t_view-NULL
    # stage-1 row under GROUP BY, so presence-of-view gates the
    # output, not t_view non-null.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    uid_ok = F.col("user_id").isNotNull()
    staged = (
        ev.withColumn(
            "has_view",
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).over(w),
        )
        .withColumn(
            "t_view",
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    uid_ok
                    & (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    uid_ok
                    & (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    stage = (
        F.lit(1)
        + F.when(F.col("t_click").isNotNull(), 1).otherwise(0)
        + F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)
    )
    return (
        staged.filter(F.col("has_view") == 1)
        .groupBy("user_id")
        .agg(
            F.first("t_view").alias("t_view"),
            F.first("t_click").alias("t_click"),
            F.first("t_purchase").alias("t_purchase"),
        )
        .select("user_id", "t_view", "t_click", "t_purchase",
                stage.alias("stage_reached"))
    )


@register(
    "rolling_volatility",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, avg(value) AS close
  FROM events GROUP BY 1, 2
), ret AS (
  SELECT user_id, day,
         close / lag(close) OVER (PARTITION BY user_id ORDER BY day) - 1
           AS daily_return
  FROM daily
)
SELECT user_id, day,
       round(stddev_samp(daily_return) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
       ), 6) AS vol_20d,
       round(daily_return, 6) AS daily_return
FROM ret
""",
    survey="ext:finance-volatility (W1-W3 family)",
    description="20-day rolling volatility: per-symbol daily returns "
    "(lag-based pct-change, W3) -> rolling sample stddev over a "
    "19-preceding frame — the risk metric beside the reference's "
    "SMA windows, same shrinking-frame semantics as min_periods=1. "
    "Divisions are safe: daily closes are event-value averages, "
    "never zero in the fixture; stddev of <2 rows is NULL in both "
    "engines.",
)
def rolling_volatility_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("close")
    )
    wlag = Window.partitionBy("user_id").orderBy("day")
    ret = daily.select(
        "user_id",
        "day",
        (F.try_divide(F.col("close"), F.lag("close").over(wlag)) - 1).alias(
            "daily_return"
        ),
    )
    wvol = wlag.rowsBetween(-19, 0)
    return ret.select(
        "user_id",
        "day",
        F.round(F.stddev_samp("daily_return").over(wvol), 6).alias("vol_20d"),
        F.round("daily_return", 6).alias("daily_return"),
    )


@register(
    "max_drawdown",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, avg(value) AS close
  FROM events GROUP BY 1, 2
), dd AS (
  SELECT user_id, day, close,
         close / max(close) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - 1 AS drawdown
  FROM daily
)
SELECT user_id,
       round(min(drawdown), 6) AS max_drawdown,
       round(max(close), 6) AS peak_close,
       count(*) AS n_days
FROM dd
GROUP BY 1
""",
    survey="ext:finance-drawdown (W4 running-extreme family)",
    description="Maximum drawdown per symbol: running peak (cumulative "
    "max window) -> close/peak - 1 -> global min per key. The running-"
    "extreme + ratio pattern complements the cumulative-return "
    "cumprod (W4); one shuffle for the daily bars, windows reuse its "
    "partitioning.",
)
def max_drawdown_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("close")
    )
    wpeak = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = daily.select(
        "user_id",
        "close",
        (F.try_divide(F.col("close"), F.max("close").over(wpeak)) - 1).alias(
            "drawdown"
        ),
    )
    return dd.groupBy("user_id").agg(
        F.round(F.min("drawdown"), 6).alias("max_drawdown"),
        F.round(F.max("close"), 6).alias("peak_close"),
        F.count(F.lit(1)).alias("n_days"),
    )


@register(
    "scd2_history",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM o
  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER w AS valid_to,
       CAST(row_number() OVER w AS BIGINT) AS version,
       CASE WHEN lead(valid_from) OVER w IS NULL THEN 1 ELSE 0
         END AS is_current
FROM s
WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
""",
    survey="ext:warehouse-scd2 (K3/K4 history dimension)",
    description="Slowly-changing-dimension type-2 intervalization: "
    "collapse each entity's change feed (events: user_id x ts x "
    "event_type) into [valid_from, valid_to) history rows — the "
    "warehouse-dimension upgrade of the reference's full-replace / "
    "upsert sinks (reference include/tasks/data_warehouse.py:78), "
    "which keep only current state. Gaps-and-islands with "
    "null-safe lag() to find change points, then lead()/"
    "row_number() over the surviving rows; both windows share one "
    "hash partitioning on user_id, so the raw feed shuffles "
    "exactly once and the second window sorts the (much smaller) "
    "change-point set.",
)
def scd2_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
        .withColumn("rn", F.row_number().over(w))
        # rn = 1 handles a key whose FIRST value is NULL — lag's
        # "no previous row" NULL would otherwise swallow it.
        .filter(
            (F.col("rn") == 1)
            | ~F.col("prev").eqNullSafe(F.col("event_type"))
        )
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.when(F.lead("valid_from").over(w2).isNull(), 1)
        .otherwise(0)
        .alias("is_current"),
    )


@register(
    "anomaly_mad",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
), mad AS (
  SELECT e.event_type,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY 1
)
SELECT e.event_id, e.event_type,
       round(e.value, 6) AS value_r,
       round(abs(e.value - m.med) / nullif(d.mad, 0), 6) AS mad_score,
       CASE WHEN round(abs(e.value - m.med) / nullif(d.mad, 0), 6) > 3.5
            THEN 1 ELSE 0 END AS is_outlier
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
""",
    survey="ext:quality-robust-outliers (A7/W family)",
    description="Robust per-group outlier detection via median "
    "absolute deviation: |x - median| / MAD > 3.5 flags anomalies "
    "without the mean/stddev's sensitivity to the outliers being "
    "hunted (the modified-z-score rule). Two exact-percentile "
    "aggregations (Spark percentile ≡ DuckDB quantile_cont, the "
    "exact_percentiles precedent) + groups-sized broadcast joins; "
    "the comparison happens on the ROUNDED score so both engines "
    "flag identical rows. At 100 TB the exact percentiles swap for "
    "approx_percentile sketches (the approx_aggregates path) with "
    "the same plan shape.",
)
def anomaly_mad_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    # med and mad are |event_type|-bounded; without materialization
    # each downstream consumer replays the events scan inside their
    # subplans (4 scans, scan_audit r7) — materializing both leaves
    # the two passes MAD inherently needs (one to rank deviations,
    # one to score rows) and nothing more
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    ).transform(materialize)
    with_med = ev.join(hint_small(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias(
            "mad"
        )
    ).transform(materialize)
    score = F.round(
        F.try_divide(
            F.abs(F.col("value") - F.col("med")),
            F.nullif(F.col("mad"), F.lit(0.0)),
        ),
        6,
    )
    return (
        with_med.join(hint_small(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value_r"),
            score.alias("mad_score"),
            F.when(score > 3.5, 1).otherwise(0).alias("is_outlier"),
        )
    )


@register(
    "event_transitions",
    oracle="""
WITH p AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type,
         event_type
  FROM events
), c AS (
  SELECT prev_type, event_type, count(*) AS n_transitions
  FROM p WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, event_type, n_transitions,
       round(n_transitions /
             (sum(n_transitions) OVER (PARTITION BY prev_type)), 6)
         AS p_next
FROM c
""",
    survey="ext:events-markov-transitions",
    description="First-order Markov transition matrix over per-user "
    "event streams: lag() pairs each event with its predecessor "
    "(PARTITION BY user_id ORDER BY ts, event_id — the same "
    "deterministic ordering the dedup/SCD2 windows use), then "
    "P(next | prev) = count / row-total. The event-stream analog of "
    "the bigram LM: one hash shuffle on user_id for the window, a "
    "map-side-combinable count on |types|^2 keys, and a window "
    "total over that tiny matrix — nothing corpus-sized survives "
    "the first aggregate.",
)
def event_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"), "event_type"
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wp), 6
        ).alias("p_next"),
    )


@register(
    "decayed_engagement",
    oracle="""
WITH e AS (
  SELECT user_id, value, epoch_ns(ts) // 1000 AS us FROM events
), mx AS (SELECT max(us) AS mx FROM e)
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 6) AS plain_sum,
       round(sum(value * exp(-(ln(2) / 168.0)
                             * ((mx - us) / 3600000000.0))), 6)
         AS decayed_sum
FROM e CROSS JOIN mx
GROUP BY user_id
""",
    survey="ext:events-decayed-aggregates",
    description="Recency-weighted engagement: per user, the "
    "exponentially time-decayed sum of event values with a one-week "
    "half-life, sum(value * 2^(-age_hours/168)), next to the plain "
    "sum — the standard freshness feature for ranking/training "
    "pipelines, and the aggregate form of EWMA (no per-row "
    "recurrence, so it needs no ordered pass: one scalar max-ts "
    "broadcast, one map-side-combinable groupBy). Ages are computed "
    "from MICROsecond-truncated epochs on both engines so the "
    "decay factors are bit-identical inputs to exp().",
)
def decayed_engagement_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", F.unix_micros("ts").alias("us")
    )
    mx = ev.agg(F.max("us").alias("mx"))
    decay = F.exp(
        -(F.lit(0.6931471805599453) / F.lit(168.0))
        * ((F.col("mx") - F.col("us")) / F.lit(3.6e9))
    )
    return (
        ev.crossJoin(hint_small(mx))  # 1-row scalar broadcast
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("plain_sum"),
            F.round(F.sum(F.col("value") * decay), 6).alias("decayed_sum"),
        )
    )


@register(
    "beta_per_key",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, avg(value) AS close
  FROM events GROUP BY 1, 2
), ret AS (
  SELECT user_id, day,
         close / lag(close) OVER (PARTITION BY user_id ORDER BY day) - 1
           AS rk
  FROM daily
), mkt AS (
  SELECT day, avg(rk) AS rm FROM ret WHERE rk IS NOT NULL GROUP BY day
), j AS (
  SELECT r.user_id, r.rk, m.rm
  FROM ret r JOIN mkt m USING (day)
  WHERE r.rk IS NOT NULL
)
SELECT user_id,
       count(*) AS n_days,
       round(covar_samp(rk, rm) / nullif(var_samp(rm), 0), 6) AS beta,
       round(avg(rk) - (covar_samp(rk, rm) / nullif(var_samp(rm), 0))
                       * avg(rm), 6) AS alpha
FROM j
GROUP BY user_id
""",
    survey="ext:finance-capm-beta (A5/W3 family)",
    description="CAPM-style market beta per key: daily returns per "
    "symbol (the reference's pct-change) regressed against the "
    "equal-weight cross-sectional market return — beta = "
    "cov(r_k, r_m)/var(r_m), alpha = the OLS intercept. The "
    "regression upgrade of the correlation matrix (same single-pass "
    "covariance aggregates, A5): one groupBy builds daily bars, one "
    "window the returns, one day-keyed aggregate the market series "
    "(days-bounded, broadcast-sized), and the final per-key "
    "aggregates are all map-side combinable. Divisor guarded with "
    "nullif on both engines.",
)
def beta_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("close")
    )
    wlag = Window.partitionBy("user_id").orderBy("day")
    ret = daily.select(
        "user_id",
        "day",
        (F.try_divide(F.col("close"), F.lag("close").over(wlag)) - 1).alias(
            "rk"
        ),
    ).filter(F.col("rk").isNotNull())
    mkt = ret.groupBy("day").agg(F.avg("rk").alias("rm"))
    j = ret.join(hint_small(mkt), "day")  # days-bounded frame
    beta = F.try_divide(
        F.covar_samp("rk", "rm"), F.nullif(F.var_samp("rm"), F.lit(0.0))
    )
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(beta, 6).alias("beta"),
        F.round(F.avg("rk") - beta * F.avg("rm"), 6).alias("alpha"),
    )


@register(
    "ohlc_bars",
    oracle="""
SELECT user_id, CAST(ts AS DATE) AS day,
       round(arg_min(value, epoch_ns(ts) // 1000), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(arg_max(value, epoch_ns(ts) // 1000), 6) AS close,
       count(*) AS n_ticks
FROM events
GROUP BY 1, 2
""",
    survey="ext:finance-ohlc-resample (A2/W5 family)",
    description="OHLC candle resample: per (symbol, day) the first/"
    "highest/lowest/last tick value plus tick count — the canonical "
    "time-series downsample every market pipeline starts from "
    "(the reference's daily bars use period averages; OHLC is the "
    "lossless-shape alternative). Single map-side-combinable "
    "aggregate: open/close are min_by/max_by on the microsecond "
    "epoch (first/last partial maxima merge associatively — one row "
    "per key-day crosses the shuffle, never raw ticks). "
    "Deterministic because (user_id, ts) is unique in the feed; "
    "both engines key on the SAME micros-truncated epoch.",
)
def ohlc_bars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    return ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(F.min_by("value", us), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max_by("value", us), 6).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@register(
    "acf_per_key",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         round(sum(value), 6) AS v
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, v,
         lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
         lag(v, 2) OVER (PARTITION BY event_type ORDER BY day) AS l2,
         lag(v, 3) OVER (PARTITION BY event_type ORDER BY day) AS l3
  FROM daily
), unp AS (
  SELECT event_type, CAST(1 AS BIGINT) AS lag, v, l1 AS vl FROM lagged
  UNION ALL
  SELECT event_type, 2, v, l2 FROM lagged
  UNION ALL
  SELECT event_type, 3, v, l3 FROM lagged
)
SELECT event_type, lag,
       round(corr(v, vl), 6) AS acf,
       count(vl) AS n_pairs
FROM unp WHERE vl IS NOT NULL
GROUP BY 1, 2 HAVING count(vl) >= 8
""",
    survey="ext:timeseries-acf",
    description="Lag-1..3 autocorrelation of each event type's daily "
    "value series: Pearson corr between the daily sum and its "
    "k-day lag — the seasonality/persistence diagnostic behind "
    "forecast model selection. Scale shape: the corpus reduces to "
    "(type, day) partial-aggregated sums FIRST (calendar-bounded, "
    "one shuffle); lags, the 3-way unpivot and corr then run over "
    "days-per-type rows. Daily sums round(6) before corr so "
    "float summation order can't leak into the statistic.",
)
def acf_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 2).over(w).alias("l2"),
        F.lag("v", 3).over(w).alias("l3"),
    )
    unp = lagged.selectExpr(
        "event_type",
        "v",
        "stack(3, CAST(1 AS BIGINT), l1, CAST(2 AS BIGINT), l2,"
        " CAST(3 AS BIGINT), l3) AS (lag, vl)",
    ).filter(F.col("vl").isNotNull())
    return (
        unp.groupBy("event_type", "lag")
        .agg(
            F.round(F.corr("v", "vl"), 6).alias("acf"),
            F.count("vl").alias("n_pairs"),
        )
        .filter(F.col("n_pairs") >= 8)
    )


@register(
    "key_skew_audit",
    oracle="""
WITH c AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
), t AS (
  SELECT sum(cnt) AS n_rows FROM c
)
SELECT CAST(t.n_rows AS BIGINT) AS n_rows,
       count(*) AS n_keys,
       CAST(max(c.cnt) AS BIGINT) AS max_cnt,
       round(max(c.cnt) * 1.0 / t.n_rows, 6) AS max_share,
       round(sum((c.cnt * 1.0 / t.n_rows) * (c.cnt * 1.0 / t.n_rows)),
             6) AS hhi,
       round(-sum((c.cnt * 1.0 / t.n_rows)
                  * ln(c.cnt * 1.0 / t.n_rows)), 6) AS entropy
FROM c CROSS JOIN t
GROUP BY t.n_rows
""",
    survey="ext:scale-key-skew-audit",
    description="Join/shuffle-key skew audit over events.user_id: "
    "one row with key count, max key share, Herfindahl index "
    "(sum p^2 — the expected relative reducer load) and Shannon "
    "entropy of the key distribution — the diagnostic that decides "
    "whether a planned groupBy/join key needs salting or AQE skew "
    "handling BEFORE the 100 TB job runs. Scale shape: one "
    "map-side-combined count per key, then order-independent "
    "aggregates over the (bounded) key-count frame; the total is a "
    "1-row broadcast.",
)
def key_skew_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.agg(F.sum("cnt").alias("n_rows"))
    p = F.col("cnt") * 1.0 / F.col("n_rows")
    return (
        c.crossJoin(hint_small(t))
        .groupBy("n_rows")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
            F.round(F.max("cnt") * 1.0 / F.first("n_rows"), 6).alias(
                "max_share"
            ),
            F.round(F.sum(p * p), 6).alias("hhi"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            "n_keys",
            F.col("max_cnt").cast("long").alias("max_cnt"),
            "max_share",
            "hhi",
            "entropy",
        )
    )


@register(
    "percentile_normalize",
    oracle="""
SELECT doc_id, lang,
       round(percent_rank() OVER (
         PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC
       ), 6) AS len_pctile
FROM documents
""",
    survey="ext:feature-quantile-normalize",
    description="Quantile feature normalization: percent_rank of "
    "document length within each language — the rank transform that "
    "makes a skewed feature comparable across strata before "
    "thresholding or curriculum ordering (deterministic doc_id "
    "tie-break so equal lengths can't flip ranks across engines). "
    "One shuffle on the stratum key; each partition sorts only its "
    "own stratum — never a global sort. At 100 TB a stratum that "
    "outgrows one executor switches to the two-pass form: "
    "approx-quantile cutpoints (sketch, map-side) + scan-stage "
    "binary-search assignment, same output contract.",
)
def percentile_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    return d.select(
        "doc_id", "lang", F.round(F.percent_rank().over(w), 6).alias("len_pctile")
    )


@register(
    "gini_per_key",
    oracle="""
WITH pos AS (
  SELECT event_type, value,
         row_number() OVER (
           PARTITION BY event_type ORDER BY value ASC, event_id ASC
         ) AS rk
  FROM events WHERE value >= 0
), g AS (
  SELECT event_type,
         count(*) AS n,
         sum(value) AS tot,
         sum(rk * value) AS rws
  FROM pos GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       round(2.0 * rws / (n * tot) - (n + 1.0) / n, 6) AS gini
FROM g WHERE tot > 0
""",
    survey="ext:analytics-gini-concentration",
    description="Gini concentration coefficient of event value per "
    "event type (0 = evenly spread, 1 = one event holds all value) — "
    "the inequality measure behind 'do a few whales dominate this "
    "feed'. Rank formulation G = 2*sum(rank*x)/(n*sum(x)) - (n+1)/n "
    "over non-negative values with deterministic event_id "
    "tie-breaks: one per-key ranking window (partition sorts its own "
    "key only) + one map-side-combinable aggregate; zero-total "
    "groups are excluded rather than divided by.",
)
def gini_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 0)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    ranked = ev.select(
        "event_type", "value", F.row_number().over(w).alias("rk")
    )
    g = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("tot"),
        F.sum(F.col("rk") * F.col("value")).alias("rws"),
    )
    return g.filter(F.col("tot") > 0).select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(
            2.0 * F.col("rws") / (F.col("n") * F.col("tot"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )
