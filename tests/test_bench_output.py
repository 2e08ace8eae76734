"""bench.py's driver contract: the FINAL stdout line must fit the
driver's bounded tail capture (~2000 chars; round 3's full per-query
line overflowed it and the driver recorded parsed=null), and the full
map must land in BENCH_DETAIL.json instead.

These tests exercise the formatting logic without running Spark.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

DRIVER_TAIL_CHARS = 2000


def test_compact_line_fits_tail_window():
    # worst case: every headline query regresses — the compact line
    # carries only the regression NAMES, never the per-query map
    times = {n: 1.234 for n in bench.HEADLINE}
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "sf": 0.1,
            "n_queries": len(times),
            "regressions": sorted(bench.HEADLINE)[:10],
            "detail": "BENCH_DETAIL.json",
        }
    )
    assert len(line) < DRIVER_TAIL_CHARS // 2, len(line)


def test_prior_round_times_prefers_snapshot():
    prev, prev_sf = bench.prior_round_times()
    # BENCH_PREV.json is committed; every headline query must have a
    # prior time so the vs_prev gate covers the full set
    assert prev, "BENCH_PREV.json missing or empty"
    assert prev_sf == 0.1
    missing = [n for n in bench.HEADLINE if n not in prev]
    # round-4+ additions to HEADLINE legitimately have no prior time
    with open(
        os.path.join(os.path.dirname(bench.__file__), "BENCH_PREV.json")
    ) as f:
        snap = json.load(f)["queries"]
    for n in snap:
        assert prev[n] == snap[n]
    assert all(t > 0 for t in prev.values())
    # a query may lack a prior time ONLY because the committed snapshot
    # (the previous round's run) predates it — i.e. it is absent from
    # the snapshot itself, not dropped by the loader. A fraction cap
    # here would just penalize adding queries mid-round.
    assert missing == [n for n in bench.HEADLINE if n not in snap]
    # and the carried-over core must still be fully covered
    core = [n for n in bench.HEADLINE[:30] if n in snap]
    assert len(core) >= 20


def test_regression_gate_math():
    # ratio strictly-greater-than gate, sorted names
    prev = {"a": 1.0, "b": 2.0, "z": 0.5}
    times = {"a": 2.0, "b": 4.1, "z": 0.4, "new": 9.9}
    vs_prev = {
        n: round(t / prev[n], 3) for n, t in times.items() if n in prev
    }
    regs = sorted(n for n, r in vs_prev.items() if r > bench.REGRESSION_RATIO)
    assert regs == ["b"]
