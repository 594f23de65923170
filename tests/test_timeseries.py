"""Time-series pack: recompute-in-numpy invariants beyond the oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from shippinglanes_spark.io import table
from shippinglanes_spark.operators.timeseries import (
    _ALPHA,
    _TAPS,
    ts_changepoint,
    ts_corr_series,
    ts_ewma,
)


def _ordered_values(spark, sf_dir):
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value")
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
    )
    return ev


def test_ewma_matches_numpy_truncation(spark, sf_dir):
    out = ts_ewma(spark, sf_dir).toPandas()
    ev = _ordered_values(spark, sf_dir)
    got = out.set_index(["user_id", "event_id"])["ewma"]
    rng = np.random.RandomState(7)
    users = rng.choice(ev["user_id"].unique(), size=5, replace=False)
    for uid in users:
        g = ev[ev["user_id"] == uid]
        vals = g["value"].to_numpy()
        for row in range(len(vals)):
            arr = vals[max(0, row - (_TAPS - 1)) : row + 1]
            wts = (1 - _ALPHA) ** np.arange(len(arr) - 1, -1, -1)
            want = float((arr * wts).sum() / ((1 - (1 - _ALPHA) ** len(arr)) / _ALPHA))
            key = (uid, g["event_id"].iloc[row])
            assert abs(got[key] - want) < 1e-5, key


def test_corr_series_bounds(spark, sf_dir):
    out = ts_corr_series(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["corr"].abs() <= 1.0 + 1e-9).all()


def test_changepoint_matches_bruteforce(spark, sf_dir):
    out = ts_changepoint(spark, sf_dir).toPandas().set_index("user_id")
    ev = _ordered_values(spark, sf_dir)
    rng = np.random.RandomState(11)
    users = rng.choice(ev["user_id"].unique(), size=5, replace=False)
    for uid in users:
        g = ev[ev["user_id"] == uid]
        v = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(v)
        cum = v.cumsum()
        i = np.arange(1, n)
        scores = np.abs(cum[:-1] / i - (cum[-1] - cum[:-1]) / (n - i)) / 100
        scores = np.floor(scores * 1e6) / 1e6
        best = scores.max()
        assert abs(out.loc[uid, "score"] - best) < 1e-9
        # the reported split ts is the earliest argmax
        argmax_ts = g["ts_us"].to_numpy()[:-1][scores == best].min()
        assert out.loc[uid, "split_us"] == argmax_ts


def test_concurrency_matches_global_sweep(spark, sf_dir):
    """The two-pass (per-day + carry) decomposition must equal a plain
    global prefix sum computed in pandas."""
    from shippinglanes_spark.operators.events import sessionized
    from shippinglanes_spark.operators.timeseries import ts_concurrency

    spans = (
        sessionized(spark, sf_dir)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_us").alias("s0"), F.max("ts_us").alias("s1"))
        .toPandas()
    )
    deltas = pd.concat(
        [
            pd.DataFrame({"ts": spans["s0"], "d": 1}),
            pd.DataFrame({"ts": spans["s1"] + 1, "d": -1}),
        ]
    ).sort_values(["ts", "d"], ascending=[True, False])
    deltas["active"] = deltas["d"].cumsum()
    deltas["day_n"] = deltas["ts"] // 86400000000
    want = deltas.groupby("day_n")["active"].max()
    got = (
        ts_concurrency(spark, sf_dir)
        .toPandas()
        .set_index("day_n")["max_concurrent"]
        .sort_index()
    )
    assert (got == want.sort_index()).all()


def test_calendar_spine_dense(spark, sf_dir):
    from shippinglanes_spark.operators.timeseries import ts_calendar_spine

    out = ts_calendar_spine(spark, sf_dir).toPandas().sort_values("day")
    days = pd.to_datetime(out["day"])
    assert (days.diff().dropna() == pd.Timedelta(days=1)).all()  # no holes
    assert (out["n"] >= 0).all()
