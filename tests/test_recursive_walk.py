"""sql_recursive_walk's recursion semantics on a planted fixture.

The oracle hash certifies cross-engine agreement on fixture data; this
test certifies the three TERMINATION MODES explicitly, each with a
customer constructed to exit the walk exactly one way:

  - cap:        big orders clear $1M mid-history -> stop, reached=1
  - exhaustion: the join on rk+1 finds no next order -> stop, reached=0
  - horizon:    many small orders hit the _RW_HORIZON depth bound
                before the cap -> stop at exactly horizon steps

A recursion bug that walked one step too far/short, dropped the anchor,
or mis-ordered accumulation changes at least one planted bucket.
"""

from __future__ import annotations

from shippinglanes_spark.operators.stats14 import (
    _RW_CAP,
    _RW_HORIZON,
    _recursive_walk_sql,
)


def test_recursive_walk_termination_modes(spark):
    big = 60_000_000  # $600k in cents: two clear the $1M cap
    rows = (
        # customer 1 — cap exit: cum after step 2 = 120M >= _RW_CAP
        [(1, rk, big) for rk in (1, 2, 3)]
        # customer 2 — exhaustion exit: 2 orders, cum 2M << cap
        + [(2, rk, 1_000_000) for rk in (1, 2)]
        # customer 3 — horizon exit: 20 x $1k never nears the cap
        + [(3, rk, 100_000) for rk in range(1, 21)]
    )
    spark.createDataFrame(
        rows, "ck bigint, rk bigint, cents bigint"
    ).createOrReplaceTempView("walk_ranked_test")
    spark.conf.set("spark.sql.cteRecursionRowLimit", "-1")
    got = {
        (r.steps, r.reached): (r.n_customers, r.avg_cum_cents)
        for r in spark.sql(
            _recursive_walk_sql("DIV", "walk_ranked_test")
        ).collect()
    }
    assert got == {
        (2, 1): (1, 2 * big),  # cap: stopped BEFORE order 3
        (2, 0): (1, 2_000_000),  # exhaustion: walked both orders
        (_RW_HORIZON, 0): (1, _RW_HORIZON * 100_000),  # depth bound
    }
    # the planted constants must actually exercise the modes they claim
    assert 2 * big >= _RW_CAP > big
    assert 20 > _RW_HORIZON > 2
