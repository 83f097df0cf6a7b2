"""Property-based parity against REAL pandas — the reference's engine.

The reference computes its metrics with pandas
(reference include/tasks/data_warehouse.py:18-19 rolling,
include/tasks/generate_dashboard.py:31-32 pct_change/cumprod); these
tests run the same recurrences through pandas itself on
hypothesis-generated series and assert our Spark operators agree,
including the NaN/edge semantics.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from b3_analytics_engine_spark.operators.windows import (
    cumulative_return,
    pct_change,
    rolling_mean,
)

# positive prices, 2-decimal like market data; short series keep the
# Spark-job-per-example cost bounded
prices = st.lists(
    st.floats(min_value=0.01, max_value=1e4).map(lambda x: round(x, 2)),
    min_size=1,
    max_size=25,
)


def _df(spark, vals):
    return spark.createDataFrame(
        [Row(symbol="A", date=i, close=float(v)) for i, v in enumerate(vals)]
    )


def _close(a, b, tol=1e-9):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return math.isclose(a, b, rel_tol=tol, abs_tol=tol)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(vals=prices, n=st.sampled_from([3, 5, 20]))
def test_rolling_mean_matches_pandas(spark, vals, n):
    got = [
        r["sma"]
        for r in rolling_mean(_df(spark, vals), "close", "symbol", "date", n, "sma")
        .orderBy("date")
        .collect()
    ]
    want = pd.Series(vals).rolling(n, min_periods=1).mean().tolist()
    assert all(_close(g, w) for g, w in zip(got, want)), (vals, n, got, want)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(vals=prices)
def test_pct_change_matches_pandas(spark, vals):
    got = [
        r["r"]
        for r in pct_change(_df(spark, vals), "close", "symbol", "date", "r")
        .orderBy("date")
        .collect()
    ]
    want = pd.Series(vals).pct_change().tolist()
    for g, w in zip(got, want):
        if isinstance(w, float) and math.isnan(w):
            assert g is None  # pandas leading NaN ≡ our NULL
        else:
            assert _close(g, w), (vals, got, want)


@settings(max_examples=8, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(vals=prices)
def test_cumulative_return_matches_pandas(spark, vals):
    rets = pd.Series(vals).pct_change()
    pdf = pd.DataFrame({"date": range(len(vals)), "r": rets})
    rows = [
        Row(symbol="A", date=int(i), r=None if pd.isna(v) else float(v))
        for i, v in zip(pdf["date"], pdf["r"])
    ]
    got = [
        r["c"]
        for r in cumulative_return(
            spark.createDataFrame(rows, "symbol string, date long, r double"),
            "r",
            "symbol",
            "date",
            "c",
        )
        .orderBy("date")
        .collect()
    ]
    want = ((1 + rets).cumprod() - 1).tolist()
    for g, w in zip(got, want):
        if isinstance(w, float) and math.isnan(w):
            assert g is None
        else:
            # cumprod over up to 25 ratios can amplify rounding; the
            # reference itself runs in double, so relative tolerance
            assert _close(g, w, tol=1e-6), (vals, got, want)
