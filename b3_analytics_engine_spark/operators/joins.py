"""Join operators (SURVEY.md §2.3, J1-J4).

The reference's only join is a driver-side dict probe over two Kafka
drains (reference include/tasks/data_processing.py:44-64): each side is
implicitly reduced to the LATEST record per symbol (later messages
overwrite earlier dict entries), then inner-joined 1:1. Here that is a
*snapshot join*: max_by-reduce each side on event time, then equi-join.

Scale notes:
- ``snapshot_join`` reduces BEFORE joining, so the join inputs are one
  row per key — at 100 TB of raw messages the shuffle carries only the
  reduced snapshots (|keys| rows), and the smaller side is broadcast.
- ``max_by(struct(*cols), ts)`` is a full map-side-combinable
  aggregation: partial aggregation happens before the shuffle, unlike a
  row_number window which must shuffle every raw row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hint_small(df: DataFrame) -> DataFrame:
    """Broadcast hint for frames whose size is bounded by a CONSTANT —
    independent of scale factor — so the hint stays safe at 100 TB.

    Legitimate callers (enforced by tests/test_plans.py's source scan:
    raw ``F.broadcast`` is banned in the queries package):

    - fixed-cardinality dimensions: ``nation`` (25 rows), ``region``
      (5 rows) — TPC-H defines them constant at every scale factor;
    - 1-row scalar-aggregate frames (grand totals, global max/avg
      thresholds) used as broadcast cross-join build sides;
    - groups-sized aggregates over a low-cardinality categorical key
      (e.g. per-event-type percentiles);
    - fixed external artifacts (a held-out eval benchmark's shingle
      set) that do not grow with the training corpus.

    Scale-growing tables (customer / supplier / part / orders /
    lineitem / documents / embeddings, or anything derived from them by
    a constant-fraction filter) must NOT use this: a forced broadcast
    bypasses ``spark.sql.autoBroadcastJoinThreshold`` and OOMs at
    100× SF. Leave those joins unhinted — the static planner
    broadcasts them while their file-size estimate fits under the
    threshold, and AQE converts to broadcast at runtime when the
    *observed* build side fits (VERDICT.md r4, "What's wrong" #1).
    """
    return F.broadcast(df)


def latest_per_key(
    df: DataFrame,
    key: str | list[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Reduce to the latest row per key (A2 / J1 build side).

    Implemented as ``max_by(struct(all_cols), order_key)`` — an
    aggregate (map-side combinable, one shuffle of partial maxima) —
    rather than a row_number window (full shuffle + sort of raw rows).
    ``tiebreak`` makes "latest" deterministic when ``ts_col`` ties,
    mirroring the reference's last-message-wins dict overwrite which is
    arrival-order-dependent (reference include/tasks/data_processing.py:47-56).
    """
    keys = [key] if isinstance(key, str) else key
    order = (
        F.struct(F.col(ts_col), F.col(tiebreak)) if tiebreak else F.col(ts_col)
    )
    others = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), order).alias("_latest")
    )
    return agg.select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in others])


def normalize_symbol(col: str | Column, suffix: str = "\\.SA$") -> Column:
    """Join-key normalization: strip the ``.SA`` exchange suffix
    (reference include/tasks/data_processing.py:55,
    ``symbol.replace(".SA", "")``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, suffix, "")


def snapshot_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_key_normalizer=None,
    broadcast_right: bool = True,
    left_tiebreak: str | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """The reference's two-feed correlation (J1+J2): latest-per-key on
    each side, optional right-key normalization, inner equi-join.

    The right side (snapshots, one row/key) is broadcast by default —
    at production scale the key cardinality (symbols) is tiny relative
    to the fact stream.
    """
    l_snap = latest_per_key(left, key, left_ts, tiebreak=left_tiebreak)
    r_snap = latest_per_key(right, key, right_ts, tiebreak=right_tiebreak)
    if right_key_normalizer is not None:
        r_snap = r_snap.withColumn(key, right_key_normalizer(F.col(key)))
        # Re-reduce in case normalization collapsed distinct raw keys
        # (e.g. "PETR4.SA" and "PETR4" both present).
        r_snap = latest_per_key(r_snap, key, right_ts, tiebreak=right_tiebreak)
    if broadcast_right:
        r_snap = F.broadcast(r_snap)
    return l_snap.join(r_snap, on=key, how="inner")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_unique_col: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-mitigating equi-join: explode the (small) right side
    ``salt_buckets``× and salt the left key deterministically, so one
    hot key spreads across ``salt_buckets`` shuffle partitions.

    AQE's skew-join splitting handles most cases at runtime; explicit
    salting is for the pathological key (one symbol = 30% of a 100 TB
    stream) where even a split partition of the BUILD side overflows.
    The salt derives from ``left_unique_col`` (not rand()) so retries
    and replays are deterministic.

    Result is row-identical to ``left.join(right, key, how)`` —
    asserted in tests.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(F.col(left_unique_col)), F.lit(salt_buckets))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l_salted.join(r_salted, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def union_history(history: DataFrame, new: DataFrame) -> DataFrame:
    """``pd.concat`` by column name
    (reference include/tasks/data_warehouse.py:73) →
    ``unionByName(allowMissingColumns=True)``."""
    return history.unionByName(new, allowMissingColumns=True)


def pivot_wide(
    df: DataFrame,
    index: str,
    pivot_col: str,
    value_col: str,
    pivot_values: list | None = None,
) -> DataFrame:
    """Long→wide reshape (J4): ``df.pivot(index, columns, values)``
    (reference include/tasks/generate_dashboard.py:52).

    Pass ``pivot_values`` when known — it skips the extra distinct-scan
    Spark otherwise runs to discover the pivot domain.
    """
    g = df.groupBy(index)
    p = g.pivot(pivot_col, pivot_values) if pivot_values else g.pivot(pivot_col)
    return p.agg(F.first(value_col))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 900,
    how: str = "inner",
) -> DataFrame:
    """Range join (point ∈ [start, end)) as a bucketed equi-join.

    A naive theta join (``p.ts >= i.start AND p.ts < i.end``) has no
    equi-key, so Spark plans a nested-loop over the full cross product
    — O(|P|·|I|) at any scale. Instead both sides get a coarse time
    bucket: each interval explodes into the buckets it covers, each
    point keys into exactly one, the join becomes hash-equi on the
    bucket, and the exact range predicate filters residual pairs
    inside each bucket. Cost drops to O(|P| + |I|·span/bucket +
    |matches|); pick ``bucket_seconds`` near the typical interval
    length so intervals explode into ~1-2 rows.

    Every (point, interval) match survives exactly once — a point
    owns one bucket, and an interval's exploded bucket list is
    distinct — so no post-join dedup is needed. ``how='left'`` keeps
    intervals with zero points (their point columns null), matching
    the LEFT form of the SQL range join.
    """
    if how not in ("inner", "left"):
        raise ValueError("point_in_interval_join supports inner/left")
    step_us = bucket_seconds * 1_000_000
    i0 = F.expr(f"unix_micros({start_col}) div {step_us}")
    # end is exclusive: the bucket of (end - 1µs) is the last covered
    i1 = F.expr(f"(unix_micros({end_col}) - 1) div {step_us}")
    iv = intervals.withColumn("_bk", F.explode(F.sequence(i0, i1)))
    pt = points.withColumn("_bk", F.expr(f"unix_micros({point_ts}) div {step_us}"))
    cond = (
        (iv["_bk"] == pt["_bk"])
        & (pt[point_ts] >= iv[start_col])
        & (pt[point_ts] < iv[end_col])
    )
    out = iv.join(pt, cond, how)
    return out.drop("_bk")
