"""Prepared-query cache: amortize Catalyst planning across repeated runs.

Sub-second analytics pay a fixed per-query-text cost every time they are
re-planned (analysis + optimization + whole-stage codegen, ~0.2-0.5 s for
multi-join plans locally) that dominates their execution at small scale.
Spark already caches the resolved ``QueryExecution`` on the DataFrame
HANDLE — re-executing the same object skips Catalyst entirely — so a
"prepared statement" surface is just handle reuse with a keyed cache:

    from shippinglanes_spark.plans.prepared import PreparedQueries

    pq = PreparedQueries(spark, sf_dir)
    pq.run("agg_groupby")     # first call: plans + executes
    pq.run("agg_groupby")     # plan reused; execution only

This is the batch analogue of a prepared statement, and the same
discipline a production deployment uses (cached DataFrames / registered
views re-served by a long-lived session). ``bench.py``'s steady-state
column measures exactly this mode; the CLI exposes it via
``run --repeat N`` so the planning/execution split is observable:

    python -m shippinglanes_spark run win_rank --repeat 3 --time

Cache keys are (query name, sf_dir); entries are plain DataFrame handles
(a logical plan + its cached QueryExecution — a few KB each), evicted
LRU beyond ``capacity``. Nothing is persisted or pinned in executor
memory: this caches PLANS, not data. For data-level reuse across
DIFFERENT downstream queries, use ``df.persist()`` / Spark's cached
views — a different tradeoff (storage for compute) that must be sized
to the cluster, which is why it is not the default here.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession


class PreparedQueries:
    """LRU cache of planned DataFrame handles for registry queries."""

    def __init__(self, spark: SparkSession, sf_dir: str, capacity: int = 64):
        from ..registry import all_queries

        self._spark = spark
        self._sf_dir = sf_dir
        self._capacity = capacity
        self._registry = all_queries()
        self._cache: OrderedDict[str, DataFrame] = OrderedDict()

    def dataframe(self, name: str) -> DataFrame:
        """The prepared handle (builds and caches on first use)."""
        if name in self._cache:
            self._cache.move_to_end(name)
            return self._cache[name]
        if name not in self._registry:
            raise KeyError(f"unknown query: {name!r}")
        df = self._registry[name].fn(self._spark, self._sf_dir)
        self._cache[name] = df
        if len(self._cache) > self._capacity:
            self._cache.popitem(last=False)
        return df

    def run(self, name: str):
        """Execute the prepared plan and return rows (list of Row)."""
        return self.dataframe(name).collect()

    def invalidate(self, name: str | None = None) -> None:
        """Drop one prepared plan (or all) — e.g. after new data lands
        in sf_dir, since a cached handle pins the file listing captured
        at planning time."""
        if name is None:
            self._cache.clear()
        else:
            self._cache.pop(name, None)
