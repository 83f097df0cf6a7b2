"""E1/E3 pipeline tests on synthetic reference-domain fixtures."""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from b3_analytics_engine_spark.pipelines import (
    dashboard_frames,
    daily_returns,
    historical_load,
    returns_correlation,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="b3pipe_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


COTAHIST_HEADER = (
    "Unnamed: 0,TIPREG,DATPRE,CODBDI,CODNEG,TPMERC,NOMRES,ESPECI,PRAZOT,"
    "MODREF,PREABE,PREMAX,PREMIN,PREMED,PREULT,PREOFC,PREOFV,TOTNEG,QUATOT,"
    "VOLTOT,PREEXE,INDOPC,DATVEN,FATCOT,PTOEXE,CODISI,DISMES"
)


def _write_cotahist(path: str) -> None:
    # synthetic rows in the COTAHIST CSV layout (FIXTURES.md §B):
    # row 2 fails the CODBDI==2 filter; row 3 has a bad numeric → dropna
    rows = [
        "0,1,2009-01-02,2,PETR4,10,PETROBRAS,PN,,R$,20.5,21.0,20.1,20.6,20.9,20.8,21.0,100,1000,20900.0,0,0,99991231,1,0,BRPETRACNPR6,101",
        "1,1,2009-01-02,96,PETR4F,20,PETROBRAS,PN,,R$,20.5,21.0,20.1,20.6,20.9,20.8,21.0,5,10,209.0,0,0,99991231,1,0,BRPETRACNPR6,101",
        "2,1,2009-01-05,2,VALE3,10,VALE,ON,,R$,bad,30.0,29.1,29.6,29.9,29.8,30.0,200,2000,59800.0,0,0,99991231,1,0,BRVALEACNOR0,102",
        "3,1,2009-01-05,2,PETR4,10,PETROBRAS,PN,,R$,20.9,21.4,20.7,21.0,21.3,21.2,21.4,120,1200,25560.0,0,0,99991231,1,0,BRPETRACNPR6,101",
    ]
    with open(path, "w", encoding="latin-1") as f:
        f.write(COTAHIST_HEADER + "\n")
        f.write("\n".join(rows) + "\n")


def test_historical_load(spark, tmpdir):
    csv = f"{tmpdir}/cotahist.csv"
    _write_cotahist(csv)
    out_path = f"{tmpdir}/lake"
    df = historical_load(spark, csv, out_path)
    rows = df.collect()
    # CODBDI!=2 filtered, bad-numeric row dropped
    assert {r["CODNEG"] for r in rows} == {"PETR4"}
    assert len(rows) == 2
    assert all(r["DATPRE"] is not None for r in rows)
    # lake written date-partitioned
    lake = spark.read.parquet(out_path)
    assert lake.count() == 2
    assert {"year", "month", "day"} <= set(lake.columns)


def _warehouse(spark):
    rows = []
    closes = {"PETR4": [10.0, 11.0, 12.1], "VALE3": [50.0, 45.0, 49.5]}
    for sym, cs in closes.items():
        for i, c in enumerate(cs):
            rows.append(
                Row(
                    symbol=sym,
                    date=f"2024-05-0{i + 1} 12:00:00",
                    close=c,
                    open=c - 0.5,
                    high=c + 1,
                    low=c - 1,
                    volume=1000.0 * (i + 1),
                    marketCap=1e9,
                    change_day=0.5,
                )
            )
    return spark.createDataFrame(rows).withColumn("date", F.to_timestamp("date"))


def test_daily_and_cumulative_returns(spark):
    wh = _warehouse(spark)
    out = daily_returns(wh).filter(F.col("symbol") == "PETR4").orderBy("date")
    rows = out.collect()
    assert rows[0]["daily_return"] is None
    assert math.isclose(rows[1]["daily_return"], 0.10)
    assert math.isclose(rows[2]["cumulative_return"], 12.1 / 10.0 - 1)


def test_returns_correlation_matrix(spark):
    wh = _warehouse(spark)
    out = returns_correlation(wh, ["PETR4", "VALE3"])
    cells = {(r["col_a"], r["col_b"]): r["corr"] for r in out.collect()}
    assert cells[("PETR4", "PETR4")] == 1.0
    assert cells[("PETR4", "VALE3")] == cells[("VALE3", "PETR4")]


def test_dashboard_render_html(spark):
    """K6 rendering: the SVG dashboard assembles from the
    query-checked frames — tiles for the three top-1 metrics, one
    polyline per symbol, one pie slice + one volume bar per symbol —
    and stays deterministic for a fixed warehouse."""
    from b3_analytics_engine_spark.sinks.dashboard import (
        bounded_history,
        render_dashboard,
    )

    # break EVERY cross-row metric tie in the fixture (volume,
    # |change_day|, high−low): the top-1 frames order by the metric
    # alone, so tied metrics make WHICH row wins partition-order-
    # dependent — operator semantics, not rendering
    jitter = (
        F.xxhash64("symbol", "date").cast("double") / F.lit(1e20)
    )
    wh = (
        _warehouse(spark)
        .withColumn("volume", F.col("volume") + jitter)
        .withColumn("change_day", F.col("change_day") + jitter)
        .withColumn("high", F.col("high") + jitter)
    )
    html = render_dashboard(wh)
    assert html.startswith("<!DOCTYPE html>")
    # three metric tiles + one price tile per symbol
    assert html.count('class="tile"') == 3 + 2
    # one polyline per symbol in the line chart
    assert html.count("<polyline") == 2
    assert "PETR4" in html and "VALE3" in html
    # pie: 2 symbols at equal cap → two 50% arcs
    assert html.count("50.0%") == 2
    # two bar charts (volume + amplitude), 2 bars each
    assert html.count("<rect") >= 4
    # deterministic output
    assert render_dashboard(wh) == html


def test_dashboard_history_collect_is_bounded(spark):
    """The line chart's driver-side collect must be cut inside Spark:
    max_points per symbol, newest rows kept."""
    from b3_analytics_engine_spark.sinks.dashboard import bounded_history

    wh = _warehouse(spark)  # 3 rows per symbol
    cut = bounded_history(wh, max_points=2)
    assert cut.count() == 4  # 2 per symbol, not 6
    newest = cut.groupBy("symbol").agg(F.max("date").alias("mx")).collect()
    full = wh.groupBy("symbol").agg(F.max("date").alias("mx")).collect()
    assert {(r["symbol"], r["mx"]) for r in newest} == {
        (r["symbol"], r["mx"]) for r in full
    }


def test_dashboard_frames(spark):
    wh = _warehouse(spark).withColumn("marketCap", F.col("marketCap"))
    frames = dashboard_frames(wh)
    assert [r["symbol"] for r in frames["symbols"].collect()] == ["PETR4", "VALE3"]
    latest = {r["symbol"]: r for r in frames["latest"].collect()}
    assert latest["PETR4"]["close"] == 12.1
    # São Paulo is UTC-3: 12:00 UTC → 09:00 local
    assert str(latest["PETR4"]["date_local"]).endswith("09:00:00")
    top_vol = frames["top_volume"].collect()[0]
    assert top_vol["volume"] == 3000.0
    shares = {r["symbol"]: r["cap_pct"] for r in frames["cap_share"].collect()}
    assert math.isclose(shares["PETR4"] + shares["VALE3"], 100.0)


def test_report_charts_render(spark, tmpdir):
    """K6 closure — the two report-generator charts (reference
    include/tasks/generate_dashboard.py:37-60): cumulative-returns
    line (x100 of the W3/W4 compounded return) and the annotated
    daily-return correlation heatmap, deterministic SVG."""
    from b3_analytics_engine_spark.sinks.dashboard import (
        render_report_charts,
        write_report_charts,
    )

    wh = _warehouse(spark)
    charts = render_report_charts(wh)
    line = charts["cumulative_returns"]
    heat = charts["correlation_heatmap"]

    # one polyline per symbol; values are the x100 compounded return
    assert line.count("<polyline") == 2
    assert "Cumulative return" in line
    # PETR4: day2 = 11/10-1 = 10%, day3 = 12.1/10-1 = 21%; the y-axis
    # label carries min..max across both symbols (VALE3 day2 = -10%)
    assert "-10.00..21.00" in line

    # heatmap: 2x2 cells, .2f annotations, diagonal exactly 1.00
    assert heat.count("<rect") == 4
    assert heat.count(">1.00<") == 2
    assert "PETR4" in heat and "VALE3" in heat
    # PETR4/VALE3 off-diagonal appears twice (symmetric)
    off = [
        c for c in ("-1.00", "-0.99", "1.00")
        if heat.count(f">{c}<")
    ]
    assert off  # a correlation value is printed

    # deterministic output (byte-stable like render_dashboard)
    again = render_report_charts(wh)
    assert again == charts

    # file sink writes both, sorted
    paths = write_report_charts(wh, f"{tmpdir}/report")
    assert [p.rsplit("/", 1)[-1] for p in paths] == [
        "correlation_heatmap.svg",
        "cumulative_returns.svg",
    ]
    with open(paths[1], encoding="utf-8") as fh:
        assert fh.read() == line


def test_heatmap_nan_and_extremes():
    """The diverging colormap and NaN handling are pure functions:
    +1 -> the red pole, -1 -> the blue pole, 0 -> white, NaN -> gray
    cell with an em-dash annotation."""
    from b3_analytics_engine_spark.sinks.dashboard import (
        _diverging_color,
        svg_heatmap,
    )

    assert _diverging_color(1.0) == "#b40426"
    assert _diverging_color(-1.0) == "#3b4cc0"
    assert _diverging_color(0.0) == "#ffffff"
    assert _diverging_color(float("nan")) == "#cccccc"
    svg = svg_heatmap(["a", "b"], {("a", "a"): 1.0, ("b", "b"): 1.0,
                                   ("a", "b"): float("nan")})
    assert "#cccccc" in svg and ">—<" in svg
