"""Semantic tests for the round-3 curation/window operators.

The DuckDB oracle proves engine agreement; these prove the *numbers mean
what the docstrings claim* on hand-built inputs (planted repetition,
known WAU), and that the plans keep the documented scale shapes.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from shippinglanes_spark.functions.curation import (
    text_boilerplate,
    text_repetition,
)
from shippinglanes_spark.registry import all_queries

Q = all_queries()


def _rep_rows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = F.split(F.col("text"), " ")
    g2 = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda u: F.size(F.filter(toks, lambda x: x == u)),
        )
    )
    return {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(toks).alias("n"),
            F.round(top.cast("double") / F.size(toks), 4).alias("top_frac"),
            F.round(
                1.0
                - F.size(F.array_distinct(g2)).cast("double")
                / F.greatest(F.size(g2), F.lit(1)),
                4,
            ).alias("dup2"),
        ).collect()
    }


def test_repetition_planted(spark):
    rows = _rep_rows(
        spark,
        [
            (1, "a a a a"),  # fully repetitive
            (2, "w x y z"),  # fully distinct
        ],
    )
    assert rows[1]["top_frac"] == 1.0
    # 2-grams of 'a a a a' = ['a a'] x3 -> 1 distinct / 3 total
    assert rows[1]["dup2"] == round(1 - 1 / 3, 4)
    assert rows[2]["top_frac"] == 0.25
    assert rows[2]["dup2"] == 0.0


def test_repetition_matches_declared_query(spark, sf_dir):
    out = text_repetition(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    for r in out:
        assert 0.0 < r["top_tok_frac"] <= 1.0
        assert 0.0 <= r["dup2_frac"] <= 1.0
        assert r["dup3_frac"] <= r["dup2_frac"] + 1e-9 or r["n_tokens"] < 3


def test_repetition_counts_match_catalyst_form(spark, sf_dir):
    """The round-12 Arrow counting pass must be EXACTLY the old pure-
    Catalyst expression form on the real fixture (the A/B equivalence
    guard for the internals change: Python split/Counter/set replicas
    vs split/aggregate-fold/array_distinct)."""
    from shippinglanes_spark.functions.text import shingles
    from shippinglanes_spark.io import table

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    top_count = F.expr(
        """
        aggregate(
          array_sort(split(text, ' ')),
          struct(cast(null as string) as prev, 0 as run, 0 as best),
          (acc, x) -> struct(
            x as prev,
            if(x = acc.prev, acc.run + 1, 1) as run,
            greatest(acc.best, if(x = acc.prev, acc.run + 1, 1)) as best),
          acc -> acc.best)
        """
    )
    dup_frac = lambda g: F.round(
        1.0
        - F.size(F.array_distinct(g)).cast("double")
        / F.greatest(F.size(g), F.lit(1)),
        4,
    )
    old = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(top_count.cast("double") / F.size(toks), 4).alias(
            "top_tok_frac"
        ),
        dup_frac(shingles(F.col("text"), 2)).alias("dup2_frac"),
        dup_frac(shingles(F.col("text"), 3)).alias("dup3_frac"),
    )
    new = text_repetition(spark, sf_dir)
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_boilerplate_fraction_bounds(spark, sf_dir):
    out = text_boilerplate(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(0.0 <= r["bp_frac"] <= 1.0 for r in out)


def test_wau_hand_computed(spark, sf_dir):
    """Cross-check win_distinct_sliding against a brute-force per-day
    recount on the same fixture."""
    got = {
        r["day"]: r["wau"]
        for r in Q["win_distinct_sliding"].fn(spark, sf_dir).collect()
    }
    from shippinglanes_spark.io import table

    events = (
        table(spark, sf_dir, "events")
        .select(
            F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
        )
        .collect()
    )
    by_day: dict = {}
    for r in events:
        by_day.setdefault(r["d"], set()).add(r["user_id"])
    for day, users in sorted(by_day.items()):
        window_users = set()
        for off in range(7):
            window_users |= by_day.get(day - datetime.timedelta(days=off), set())
        assert got[str(day)] == len(window_users), day


def test_wau_window_input_is_rollup(spark, sf_dir):
    """The single-partition window must consume the per-day rollup, not
    raw events: the aggregate sits below the window in the plan."""
    df = Q["win_distinct_sliding"].fn(spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    # top-down plan text: Window appears above (before) the aggregate
    assert p.index("Window") < p.index("ObjectHashAggregate")
    # and the single-partition exchange sits between them, not below the agg
    assert (
        p.index("Window")
        < p.index("Exchange SinglePartition")
        < p.index("ObjectHashAggregate")
    )
