"""Sessionization edge cases (FIXTURES.md sessions_edge spec): gaps
exactly at/around the 30-min threshold, single-event users, all-same-ts
users — plus hypothesis invariants."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from shippinglanes_spark.operators.events import SESSION_GAP_US


def sessionize_df(spark, rows):
    """rows: (user_id, event_id, ts_us). Runs the engine's gap logic on a
    constructed frame (same expressions as operators.events.sessionized)."""
    from pyspark.sql import Window

    e = spark.createDataFrame(rows, "user_id long, event_id long, ts_us long")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    return e.withColumn(
        "session_id",
        F.sum(F.when(gap > SESSION_GAP_US, 1).otherwise(0)).over(wrun).cast("long"),
    )


def test_threshold_boundaries(spark):
    t0 = 1_700_000_000_000_000
    gap = SESSION_GAP_US
    rows = [
        (1, 0, t0),
        (1, 1, t0 + gap - 1),          # 29:59.999999 -> same session
        (1, 2, t0 + 2 * gap - 1),      # exactly 30:00 gap -> same session (strict >)
        (1, 3, t0 + 3 * gap),          # 30:00.000001 gap -> NEW session
    ]
    got = {r.event_id: r.session_id for r in sessionize_df(spark, rows).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1}


def test_single_event_and_same_ts_users(spark):
    t0 = 1_700_000_000_000_000
    rows = [(1, 0, t0)] + [(2, i, t0) for i in range(1, 4)]
    out = sessionize_df(spark, rows).collect()
    assert all(r.session_id == 0 for r in out)


@settings(max_examples=15, deadline=None)
@given(
    gaps=st.lists(st.integers(min_value=0, max_value=4 * SESSION_GAP_US), max_size=25)
)
def test_sessionize_invariants(spark, gaps):
    t, rows = 1_700_000_000_000_000, []
    for i, g in enumerate(gaps):
        t += g
        rows.append((1, i, t))
    if not rows:
        return
    out = sorted(sessionize_df(spark, rows).collect(), key=lambda r: r.ts_us)
    sids = [r.session_id for r in out]
    # session ids start at 0, increase by 0/1 in time order
    assert sids[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(sids, sids[1:]))
    # a session break happens iff the gap exceeds the threshold
    for (a, b) in zip(out, out[1:]):
        assert (b.session_id - a.session_id == 1) == (b.ts_us - a.ts_us > SESSION_GAP_US)


def test_approx_distinct_within_5pct(spark, sf_dir):
    from shippinglanes_spark.io import table

    ev = table(spark, sf_dir, "events")
    got = {
        r.event_type: r.approx_users
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(1, 0.05 * n)


def test_session_window_agrees_with_gap_sessionize(spark, sf_dir):
    """Cross-validation: Spark's built-in session_window (30-min gap
    merge) must produce the same per-user session count as the engine's
    lag/running-sum sessionization."""
    from shippinglanes_spark.io import table
    from shippinglanes_spark.operators.events import sessionized

    ev = table(spark, sf_dir, "events")
    via_builtin = {
        r.user_id: r.n
        for r in ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    via_engine = {
        r.user_id: r.n
        for r in sessionized(spark, sf_dir)
        .groupBy("user_id")
        .agg((F.max("session_id") + 1).alias("n"))
        .collect()
    }
    assert via_builtin == via_engine


def test_quantile_sketch_close_to_exact(spark, sf_dir):
    from shippinglanes_spark.io import table

    ev = table(spark, sf_dir, "events")
    approx = {
        r.event_type: (r.med_approx, r.p95_approx)
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("med_approx"),
            F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
        )
        .collect()
    }
    exact = {
        r.event_type: (r.med, r.p95)
        for r in ev.groupBy("event_type")
        .agg(
            F.median("value").alias("med"),
            F.percentile("value", 0.95).alias("p95"),
        )
        .collect()
    }
    for k, (m, p) in exact.items():
        am, ap = approx[k]
        assert abs(am - m) <= max(1.0, 0.05 * abs(m))
        assert abs(ap - p) <= max(1.0, 0.05 * abs(p))


def test_stratified_sample_fractions(spark, sf_dir):
    from shippinglanes_spark.io import table

    ev = table(spark, sf_dir, "events")
    fractions = {"click": 0.5, "view": 0.1, "purchase": 1.0, "signup": 1.0, "error": 0.0}
    got = {
        r.event_type: r.n
        for r in ev.sampleBy("event_type", fractions, seed=42)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    base = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "error" not in got  # fraction 0 -> stratum absent
    assert got["purchase"] == base["purchase"]  # fraction 1 -> all kept
    for t, frac in (("click", 0.5), ("view", 0.1)):
        # Bernoulli sampling: allow generous tolerance at fixture sizes
        assert abs(got[t] / base[t] - frac) < 0.15


from hypothesis import given as _given, settings as _settings, strategies as _st


@_settings(max_examples=12, deadline=None)
@_given(
    vals=_st.lists(
        _st.tuples(
            _st.integers(min_value=1, max_value=3),   # key
            _st.integers(min_value=0, max_value=100), # ts
            _st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        max_size=20,
    )
)
def test_running_sum_matches_python_model(spark, vals):
    from pyspark.sql import Window

    rows = [(k, i, t, v) for i, (k, t, v) in enumerate(vals)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "k long, rid long, ts long, v double")
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r.rid: r.cum
        for r in df.withColumn("cum", F.round(F.sum("v").over(w), 6)).collect()
    }
    by_key: dict = {}
    for k, rid, t, v in sorted(rows, key=lambda r: (r[2], r[1])):
        by_key.setdefault(k, 0.0)
        by_key[k] += v
        assert abs(got[rid] - round(by_key[k], 6)) < 1e-6


@_settings(max_examples=12, deadline=None)
@_given(
    vals=_st.lists(
        _st.tuples(
            _st.integers(min_value=1, max_value=3),
            _st.integers(min_value=0, max_value=20),  # ts with collisions
        ),
        max_size=20,
    )
)
def test_dedup_keep_latest_matches_python_model(spark, vals):
    from pyspark.sql import Window

    rows = [(k, i, t) for i, (k, t) in enumerate(vals)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "k long, rid long, ts long")
    w = Window.partitionBy("k").orderBy(F.desc("ts"), F.desc("rid"))
    got = {
        r.k: r.rid
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    want: dict = {}
    for k, rid, t in rows:
        if k not in want or (t, rid) > want[k][:2]:
            want[k] = (t, rid)
    assert got == {k: rid for k, (t, rid) in want.items()}


def test_exact_quantiles_high_cardinality_groups(spark):
    """The exact percentile aggregate is safe on the group-COUNT axis:
    many small groups each buffer only their own rows (SCALING.md's
    routing rule — the dangerous axis is rows-per-group, covered by the
    sketch). 50k single-digit-row groups must aggregate exactly."""
    df = (
        spark.range(200_000)
        .select(
            (F.col("id") % 50_000).alias("k"),
            (F.col("id") * 7 % 1000).cast("double").alias("v"),
        )
    )
    got = df.groupBy("k").agg(F.percentile("v", 0.5).alias("med"))
    assert got.count() == 50_000
    # spot-check one group against a hand computation: k=0 holds
    # ids {0, 50k, 100k, 150k} -> v = {0, 350000%1000, ...}
    vals = sorted(((i * 7) % 1000) for i in (0, 50_000, 100_000, 150_000))
    want = (vals[1] + vals[2]) / 2
    row = got.where(F.col("k") == 0).first()
    assert abs(row.med - want) < 1e-9
