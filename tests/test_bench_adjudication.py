"""bench.py self-adjudication (r10 verdict "what's wrong" #1): a
one-off timing spike must be re-timed before it reaches the artifact,
and the artifact must record what happened (`retimed` entries) so no
judge session is needed to clear it. Pure logic — no Spark."""

from __future__ import annotations

import json

import bench


def test_history_loader_reads_driver_wrapper_artifacts():
    """The committed BENCH_r*.json files are driver wrappers whose
    timings live in a (possibly mid-line-truncated) `tail` string —
    the loader must still recover per-query floors and latest values.
    r10's outlier values must be present as `prev` so this round's
    gate sees them."""
    floors, prev = bench.load_bench_history()
    assert len(floors) >= 70  # most of the headline set has history
    assert set(floors) <= set(bench.HEADLINE)  # no control_sec etc.
    for q in ("ohlc_bars", "png_decode_stats", "pricing_summary"):
        assert q in floors and q in prev
        assert 0 < floors[q] <= prev[q] * 1.0001
    # r10 artifact is the latest recording of ohlc_bars -> prev is its
    # (adjudicated-noise) 0.999, while the floor stays the true steady
    # state — the min() of the two bounds keeps the gate tight
    assert prev["ohlc_bars"] > 2 * floors["ohlc_bars"]


def test_spike_is_retimed_and_recorded():
    calls = []

    def retime():
        calls.append(1)
        return 0.25  # steady state on retry

    sec, entry, flagged = bench.adjudicate_timing(
        "q", 1.0, floors={"q": 0.2}, prev={"q": 0.22}, retime=retime
    )
    assert sec == 0.25 and len(calls) == 1  # stopped once under bound
    assert not flagged
    assert entry == {"first": 1.0, "final": 0.25, "bound": 0.44}
    json.dumps(entry)  # artifact-serializable


def test_persistent_slowdown_stays_flagged():
    """A REAL regression re-times RETIME_EXTRA_RUNS times, keeps the
    minimum, and is still flagged — adjudication never hides a true
    slowdown, it only retries it."""
    calls = []

    def retime():
        calls.append(1)
        return 1.0 - 0.01 * len(calls)

    sec, entry, flagged = bench.adjudicate_timing(
        "q", 1.05, floors={"q": 0.2}, prev={"q": 0.22}, retime=retime
    )
    assert len(calls) == bench.RETIME_EXTRA_RUNS
    assert sec == 0.98 and flagged
    assert entry["first"] == 1.05 and entry["final"] == 0.98


def test_fast_timing_passes_untouched():
    sec, entry, flagged = bench.adjudicate_timing(
        "q", 0.21, floors={"q": 0.2}, prev={"q": 0.22},
        retime=lambda: (_ for _ in ()).throw(AssertionError("no retime")),
    )
    assert (sec, entry, flagged) == (0.21, None, False)


def test_new_query_without_history_never_retimes():
    sec, entry, flagged = bench.adjudicate_timing(
        "brand_new", 9.9, floors={}, prev={},
        retime=lambda: (_ for _ in ()).throw(AssertionError("no retime")),
    )
    assert (sec, entry, flagged) == (9.9, None, False)


def test_bound_is_tighter_of_prev_and_floor():
    """One noisy round must not loosen the next round's gate: with
    prev inflated (r10 ohlc_bars), 3x floor still governs."""
    retimes = iter([0.5])
    sec, entry, flagged = bench.adjudicate_timing(
        "q", 0.9, floors={"q": 0.2}, prev={"q": 1.0},
        retime=lambda: next(retimes),
    )
    # bound = min(2*1.0, 3*0.2) = 0.6 -> 0.9 triggers a retime
    assert entry is not None and entry["bound"] == 0.6
    assert sec == 0.5 and not flagged
