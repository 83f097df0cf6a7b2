"""Distribution-drift audits: PSI and binned two-sample KS.

A 100 TB corpus is assembled from many sources over many snapshots;
before a source is admitted into a training mix, its feature
distributions are compared against the corpus (or the previous
snapshot). The two canonical statistics:

- **PSI** (population stability index): ``sum((p - q) * ln(p / q))``
  over fixed histogram bins — the standard "has this feed shifted"
  score (< 0.1 stable, > 0.25 action).
- **KS** (Kolmogorov-Smirnov, binned): ``max |CDF_a - CDF_b|`` over
  the same fixed bins — sensitive to location shifts PSI smooths out.

Scale design: both reduce the metric column to a FIXED bin id at scan
stage (codegen'd arithmetic, no UDF), then a single
``groupBy(group, bin)`` count — the only shuffle, and its output is
``|groups| x |bins|`` rows regardless of corpus size. The dense
(group x bin) grid needed for zero-count bins is built from two
post-aggregation frames that are vocabulary-bounded, so the grid join
is a broadcast at any corpus scale. Exact binned CDFs replace the
classical sorted-sample KS, which would need a global sort — the
binned statistic is deterministic, cross-engine reproducible, and the
resolution knob (``n_bins``) bounds the error.

Reference parity: the reference engine has no drift operator; this is
part of the LLM-training-data extension surface (SURVEY.md §2 ext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .common import materialize

EPS = 1e-6


def fixed_bin(col, bin_width: int, n_bins: int):
    """Clamped fixed-width bin id: ``least(floor(col / w), n-1)`` —
    pure scan-stage arithmetic, identical in ANSI SQL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(
        F.floor(c / F.lit(bin_width)), F.lit(n_bins - 1)
    ).cast("long")


def _dense_counts(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    bin_width: int,
    n_bins: int,
) -> DataFrame:
    """(group, bin, cnt) over the DENSE group x bin grid (zero-count
    bins present): one count shuffle, then a broadcast-sized grid
    left-join to fill holes."""
    binned = df.select(
        F.col(group_col).alias("grp"),
        fixed_bin(metric_col, bin_width, n_bins).alias("bin"),
    )
    counts = binned.groupBy("grp", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # distinct groups come from the already-aggregated counts frame
    # (|groups| x |bins| rows), NOT from the raw corpus — deriving
    # them from `binned` would re-scan and re-shuffle the full input
    # a second time; this keeps the corpus shuffled exactly once and
    # the grid genuinely vocabulary-bounded.
    # counts feeds MULTIPLE consumers (the grid distinct here, the
    # left join below, and psi/ks derive 3 more frames from `dense`)
    # whose exchanges hash on different keys, so ReuseExchange never
    # fires — without materialization the full input scan+shuffle
    # replays once per consumer (measured: 8 parquet scans in
    # psi_drift's physical plan). Materialize the tiny aggregate
    # so the corpus is scanned and shuffled exactly once.
    counts = counts.transform(materialize)
    grid = (
        counts.select("grp")
        .distinct()
        .crossJoin(
            df.sparkSession.range(n_bins).select(
                F.col("id").alias("bin")
            )
        )
    )
    # psi/ks each hang 3+ consumers off the dense frame (ref, totals,
    # the share join); materialize it too so the grid join runs once.
    # A/B at sf0.1 (interleaved min-of-4, ARCHITECTURE.md r7): this
    # double-materialize shape times within noise of the fastest local
    # variant while being the only one that scans the raw corpus
    # exactly once — the property that matters at 100 TB.
    return grid.join(counts, ["grp", "bin"], "left").select(
        "grp", "bin", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    ).transform(materialize)


def psi(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    bin_width: int = 256,
    n_bins: int = 32,
) -> DataFrame:
    """Per-group PSI of ``metric_col``'s histogram vs the WHOLE
    frame's histogram (the corpus is the reference population).

    Returns ``(group, psi, n_rows)`` with ``psi`` rounded to 6 dp.
    Shares are ``(cnt + eps)``-smoothed so empty bins contribute a
    finite, deterministic penalty instead of ±inf.
    """
    dense = _dense_counts(df, group_col, metric_col, bin_width, n_bins)
    ref = dense.groupBy("bin").agg(F.sum("cnt").alias("ref_cnt"))
    ref_tot = ref.agg(F.sum("ref_cnt").alias("ref_tot"))
    grp_tot = dense.groupBy("grp").agg(F.sum("cnt").alias("grp_tot"))
    p = (
        dense.join(grp_tot, "grp")
        .join(F.broadcast(ref), "bin")
        .crossJoin(F.broadcast(ref_tot))
        .select(
            "grp",
            "grp_tot",
            (F.col("cnt") / F.col("grp_tot") + F.lit(EPS)).alias("p"),
            (F.col("ref_cnt") / F.col("ref_tot") + F.lit(EPS)).alias(
                "q"
            ),
        )
    )
    return (
        p.groupBy("grp")
        .agg(
            F.round(
                F.sum(
                    (F.col("p") - F.col("q"))
                    * F.log(F.col("p") / F.col("q"))
                ),
                6,
            ).alias("psi"),
            F.first("grp_tot").alias("n_rows"),
        )
        .select(
            F.col("grp").alias(group_col), "psi", "n_rows"
        )
    )


def ks_binned(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    bin_width: int = 128,
    n_bins: int = 64,
) -> DataFrame:
    """Per-group binned two-sample KS statistic of ``metric_col``
    vs the COMPLEMENT of the group (rest of the frame).

    Returns ``(group, ks_stat, n_rows)``, ``ks_stat`` rounded to
    6 dp: ``max_bins |cum_share_group - cum_share_rest|``. The
    cumulative window runs over ``n_bins`` rows per group — bounded
    by the resolution knob, never by data size.

    Degenerate input: if the frame holds a SINGLE group, its
    complement is empty and the two-sample statistic is undefined —
    the division is explicitly guarded (``r_tot > 0``) and the row
    is emitted with ``ks_stat = NULL`` by design, so callers see a
    deliberate NULL rather than an accidental divide-by-zero one.
    """
    dense = _dense_counts(df, group_col, metric_col, bin_width, n_bins)
    tot = dense.groupBy("bin").agg(F.sum("cnt").alias("tot_cnt"))
    both = dense.join(F.broadcast(tot), "bin").select(
        "grp",
        "bin",
        F.col("cnt").alias("g_cnt"),
        (F.col("tot_cnt") - F.col("cnt")).alias("r_cnt"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("grp")
    cum = both.select(
        "grp",
        "bin",
        F.sum("g_cnt").over(w).alias("g_cum"),
        F.sum("r_cnt").over(w).alias("r_cum"),
        F.sum("g_cnt").over(wg).alias("g_tot"),
        F.sum("r_cnt").over(wg).alias("r_tot"),
    )
    return (
        cum.groupBy("grp")
        .agg(
            F.round(
                F.max(
                    F.when(
                        F.col("r_tot") > 0,
                        F.abs(
                            F.col("g_cum") / F.col("g_tot")
                            - F.col("r_cum") / F.col("r_tot")
                        ),
                    )
                ),
                6,
            ).alias("ks_stat"),
            F.first("g_tot").alias("n_rows"),
        )
        .select(F.col("grp").alias(group_col), "ks_stat", "n_rows")
    )
