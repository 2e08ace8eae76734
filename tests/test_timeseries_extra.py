"""Holt linear-trend smoothing vs a pure-Python recurrence."""

import math

import pytest
from pyspark.sql import functions as F

from etl_hero_spark.registry import _events
from etl_hero_spark.timeseries import holt_linear


def _ref_holt(xs, a, b):
    lvl = trd = None
    n = 0
    out = []
    for x in xs:
        if x is None:
            out.append((lvl, trd))
            continue
        if n == 0:
            lvl, trd = x, None
        elif n == 1:
            prev = lvl
            lvl = a * x + (1 - a) * (lvl + 0.0)
            trd = x - prev
        else:
            prev = lvl
            lvl = a * x + (1 - a) * (lvl + trd)
            trd = b * (lvl - prev) + (1 - b) * trd
        n += 1
        out.append((lvl, trd))
    return out


def test_holt_matches_reference_on_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = holt_linear(
        ev, ["user_id"], "ts", "value", alpha=0.3, beta=0.1, horizon=2
    )
    rows = got.orderBy("user_id", "ts", "value").collect()
    by_user = {}
    for r in ev.select("user_id", "ts", "value").collect():
        by_user.setdefault(r[0], []).append((r[1], r[2]))
    for uid, pts in by_user.items():
        pts.sort(key=lambda p: (p[0], float("-inf") if p[1] is None else p[1]))
    checked = 0
    cur = None
    buf = []
    for r in rows + [None]:
        if r is None or (cur is not None and r["user_id"] != cur):
            ref = _ref_holt([p[1] for p in by_user[cur]], 0.3, 0.1)
            assert len(buf) == len(ref)
            for (lv, tr, fc), (rl, rt) in zip(buf, ref):
                if rl is None:
                    assert lv is None
                else:
                    assert lv == pytest.approx(rl, rel=1e-12)
                if rt is None:
                    assert tr is None and fc is None
                else:
                    assert tr == pytest.approx(rt, rel=1e-12)
                    assert fc == pytest.approx(rl + 2 * rt, rel=1e-12)
                checked += 1
            buf = []
        if r is not None:
            cur = r["user_id"]
            buf.append((r["level"], r["trend"], r["forecast"]))
    assert checked > 100


def test_holt_linear_trend_is_learned_exactly(spark):
    """On a perfectly linear series, level tracks the line and trend
    converges to the slope; forecast extrapolates correctly."""
    rows = [(1, i, 10.0 + 3.0 * i) for i in range(30)]
    df = spark.createDataFrame(rows, "k int, t int, x double")
    last = (
        holt_linear(df, ["k"], "t", "x", alpha=0.5, beta=0.5, horizon=1)
        .orderBy(F.desc("t"))
        .first()
    )
    assert last["trend"] == pytest.approx(3.0, abs=1e-3)
    assert last["level"] == pytest.approx(last["x"], abs=1e-2)
    assert last["forecast"] == pytest.approx(last["x"] + 3.0, abs=1e-2)


def test_holt_null_carry(spark):
    rows = [(1, 0, 1.0), (1, 1, None), (1, 2, 2.0)]
    df = spark.createDataFrame(rows, "k int, t int, x double")
    got = {
        r["t"]: (r["level"], r["trend"])
        for r in holt_linear(df, ["k"], "t", "x").collect()
    }
    assert got[1] == got[0]  # null row carries prior state
    assert got[2][1] == pytest.approx(1.0)  # trend = x1 - x0 on 2nd obs
