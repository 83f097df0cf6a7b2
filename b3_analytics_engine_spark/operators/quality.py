"""Data-quality audit operators — the validation pass every
large-scale training-data or warehouse pipeline runs before it
trusts an input drop.

The reference has only ad-hoc guards (`df_filtered.empty`,
`dropna(subset=...)` — include/tasks/batch_ingestion.py:30,37,
include/tasks/data_warehouse.py:16,58); this module makes the checks
first-class and *auditable*: every check reports its violation count
instead of silently dropping rows.

Scale design:

- :func:`constraint_report` folds ALL predicate checks into ONE
  aggregate over ONE scan — at 100 TB you cannot afford a pass per
  rule. Each check is a conditional sum inside the same whole-stage-
  codegen'd partial aggregate; the shuffle carries one row per
  partition regardless of table size or rule count.
- :func:`duplicate_key_count` is a distinct-count against the row
  count — one hash aggregate on the key columns only (the scan prunes
  every other column).
- :func:`orphan_count` is ONE left-outer equi-join on the key columns
  feeding ONE aggregate: total rows and unmatched rows come out of the
  same scan, so there is no second pass and no 1-row cross join.
  Broadcast when the parent is a dimension, shuffle-hash when both
  sides are facts. Either way only keys move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations(pred: Column) -> Column:
    """Violation counter for one rule: rows where ``pred`` is not
    satisfied. NULL predicate input counts as a violation (a range
    check on a NULL value fails it, matching SQL CASE semantics on
    both Spark and any ANSI oracle)."""
    return F.sum(F.when(pred, 0).otherwise(1))


def constraint_report(
    df: DataFrame, table_name: str, checks: dict[str, Column]
) -> DataFrame:
    """Audit ``df`` against named predicate rules in a single scan.

    Returns one row per check: ``(table_name, check_name,
    n_violations, n_rows, violation_rate)``. All counts come out of
    one aggregation (wide → long via ``stack``), so adding a rule
    adds an expression, never a pass.
    """
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        violations(pred).alias(name) for name, pred in checks.items()
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', `{name}`" for name in checks)
    long = wide.select(
        F.col("_n"),
        F.expr(
            f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)"
        ),
    )
    return long.select(
        F.lit(table_name).alias("table_name"),
        "check_name",
        "n_violations",
        F.col("_n").alias("n_rows"),
        F.round(F.col("n_violations") / F.col("_n"), 6).alias(
            "violation_rate"
        ),
    )


def quarantine_split(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Row-level rule routing: (clean_rows, quarantined_rows).

    Quarantined rows carry ``failed_rules`` — a comma-joined, rule-
    order string of every check they violate (concat_ws skips the NULL
    slots of passing rules, in Spark and ANSI SQL alike, which is what
    keeps the column oracle-checkable). One predicate evaluation per
    rule per row inside one codegen'd projection; both outputs are
    filters over the same annotated frame, so a persisted upstream is
    scanned once. NULL check inputs fail the rule (same convention as
    :func:`violations`).
    """
    failed = F.concat_ws(
        ",",
        *[
            F.when(pred, F.lit(None).cast("string")).otherwise(F.lit(name))
            for name, pred in checks.items()
        ],
    )
    annotated = df.withColumn("failed_rules", failed)
    clean = annotated.filter(F.col("failed_rules") == "").drop("failed_rules")
    bad = annotated.filter(F.col("failed_rules") != "")
    return clean, bad


def duplicate_key_count(
    df: DataFrame, table_name: str, key_cols: list[str], check_name: str
) -> DataFrame:
    """Primary-key uniqueness as a report row: violations = rows
    beyond the first per key (``count(*) − count(distinct key)``)."""
    agg = df.select(*key_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct(*[F.col(c) for c in key_cols]).alias("_d"),
    )
    return agg.select(
        F.lit(table_name).alias("table_name"),
        F.lit(check_name).alias("check_name"),
        (F.col("_n") - F.col("_d")).alias("n_violations"),
        F.col("_n").alias("n_rows"),
        F.round((F.col("_n") - F.col("_d")) / F.col("_n"), 6).alias(
            "violation_rate"
        ),
    )


def orphan_count(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    table_name: str,
    check_name: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential integrity as a report row: violations = child rows
    whose ``fk`` has no match in ``parent.pk``.

    Single-scan shape: a left-outer equi-join against the distinct
    parent keys (tagged ``_present``), then one aggregate computing
    both the total row count and the unmatched count. A NULL fk never
    equi-matches, so it counts as an orphan — the same semantics the
    previous left-anti formulation had.
    """
    keys = (
        parent.select(F.col(pk).alias(fk))
        .distinct()
        .withColumn("_present", F.lit(1))
    )
    if broadcast_parent:
        keys = F.broadcast(keys)
    agg = (
        child.select(fk)
        .join(keys, fk, "left")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(
                F.when(F.col("_present").isNull(), 1).otherwise(0)
            ).alias("_o"),
        )
    )
    # F.sum over zero rows is NULL and ANSI division by a zero count
    # throws: coalesce/guard so an empty child reports 0 violations at
    # rate 0.0, matching the previous left-anti formulation
    orphans = F.coalesce(F.col("_o"), F.lit(0))
    rate = F.when(
        F.col("_n") > 0, F.round(orphans / F.col("_n"), 6)
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.lit(table_name).alias("table_name"),
        F.lit(check_name).alias("check_name"),
        orphans.alias("n_violations"),
        F.col("_n").alias("n_rows"),
        rate.alias("violation_rate"),
    )


def k_anonymity(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set: every
    equivalence class with its size and whether it re-identifies
    (size < k) — the privacy check a curation pipeline runs before a
    table with demographic-ish columns is released for training
    (Sweeney 2002, public definition).

    Scale design: one ``groupBy`` over the QI columns — the output is
    bounded by QI cardinality, not row count, and the count is
    map-side combined. Pairs with :func:`~..operators.text.redact_pii`
    (row contents) the way this audits row LINKABILITY.
    """
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("at_risk", F.col("group_size") < k)
    )
