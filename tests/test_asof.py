"""As-of join: pandas.merge_asof oracle, tie determinism, plan shape."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    # deterministic pseudo-random event streams over 5 keys, distinct ts
    left_rows = [
        (i, (i * 37) % 5, _ts((i * 13) % 97 + (0.25 if i % 2 else 0.0)), float(i))
        for i in range(60)
    ]
    right_rows = [
        (1000 + j, (j * 11) % 5, _ts((j * 29) % 97 + 0.5), float(j) * 10.0)
        for j in range(45)
    ]
    lf = spark.createDataFrame(left_rows, "lid long, k long, ts timestamp, lv double")
    rf = spark.createDataFrame(right_rows, "rid long, k long, ts timestamp, rv double")
    lp = pd.DataFrame(left_rows, columns=["lid", "k", "ts", "lv"])
    rp = pd.DataFrame(right_rows, columns=["rid", "k", "ts", "rv"])
    return lf, rf, lp, rp


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tol", [None, 600.0])
def test_asof_matches_pandas_merge_asof(spark, direction, tol):
    lf, rf, lp, rp = _frames(spark)
    got = {
        r.lid: (r.rid, r.ts_r, r.rv)
        for r in asof_join(
            lf, rf, on="ts", by=["k"], direction=direction, tolerance_sec=tol
        ).collect()
    }
    want_df = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts"),
        on="ts",
        by="k",
        direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        suffixes=("", "_r"),
    )
    assert len(got) == len(lp)
    for row in want_df.itertuples():
        g_rid, g_ts, g_rv = got[row.lid]
        if pd.isna(row.rid):
            assert g_rid is None and g_ts is None and g_rv is None
        else:
            assert g_rid == int(row.rid)
            assert g_rv == row.rv
    # pandas drops right.ts under suffix collision rules; check one by hand
    sample = want_df[~want_df.rid.isna()].iloc[0]
    rid = int(sample.rid)
    expect_ts = rp[rp.rid == rid].ts.iloc[0].to_pydatetime()
    assert got[int(sample.lid)][1] == expect_ts


def test_asof_tiebreak_is_deterministic(spark):
    lf = spark.createDataFrame(
        [(1, 0, _ts(10))], "lid long, k long, ts timestamp"
    )
    rf = spark.createDataFrame(
        [(100, 0, _ts(5), 1.0), (101, 0, _ts(5), 2.0), (102, 0, _ts(5), 3.0)],
        "rid long, k long, ts timestamp, rv double",
    )
    back = asof_join(lf, rf, by=["k"], direction="backward", tiebreak="rid").collect()[0]
    assert back.rid == 102  # greatest tiebreak wins backward
    lf_before = spark.createDataFrame([(1, 0, _ts(1))], "lid long, k long, ts timestamp")
    fwd = asof_join(lf_before, rf, by=["k"], direction="forward", tiebreak="rid").collect()[0]
    assert fwd.rid == 100  # least tiebreak wins forward


def test_asof_exact_match_is_inclusive(spark):
    lf = spark.createDataFrame([(1, 0, _ts(5))], "lid long, k long, ts timestamp")
    rf = spark.createDataFrame(
        [(100, 0, _ts(5), 7.0)], "rid long, k long, ts timestamp, rv double"
    )
    for direction in ("backward", "forward"):
        row = asof_join(lf, rf, by=["k"], direction=direction).collect()[0]
        assert row.rid == 100 and row.rv == 7.0


def test_asof_single_shuffle_plan(spark):
    """The whole join is one hash shuffle on the by keys: no join node, no
    second exchange — the property that makes it scale past a range join."""
    from engine.plans import inspect as pi

    lf, rf, _, _ = _frames(spark)
    plan = pi.physical_plan(asof_join(lf, rf, by=["k"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
