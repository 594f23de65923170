"""Query registry: the executable form of SURVEY.md §2's operator inventory.

Each operator row is registered as a named query: a Spark implementation
(DataFrame API — never just ``spark.sql(oracle)``) plus, where the
semantics are ANSI-expressible, the DuckDB oracle SQL the driver compares
against. Registration colocates the two so the column-name/rounding/type
contract stays in one place.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    section: str
    notes: str = ""
    declare: bool = True  # only declared queries are exported to the driver


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    section: str,
    oracle: str | None = None,
    notes: str = "",
    declare: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, section, notes, declare)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def driver_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in all_queries().values() if q.declare}


def driver_oracles() -> dict[str, str]:
    return {
        q.name: q.oracle
        for q in all_queries().values()
        if q.declare and q.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregation,
        events,
        joins,
        projection,
        scans,
        setops,
        sorting,
        tpch,
        udfs,
        windows,
    )
    from .functions import (  # noqa: F401
        minhash,
        multimodal,
        scalar,
        similarity,
        text,
    )
    from .sources import io_roundtrip  # noqa: F401
    from .streaming import lift  # noqa: F401

    _LOADED = True
