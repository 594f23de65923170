"""Skew mitigation for keyed joins (SURVEY §4 / 100 TB mandate).

First line of defense is AQE's skew-join splitting (on by default in the
session factory). `salted_join` is the explicit fallback for the shapes
AQE can't fix — e.g. a hot key joining a dimension that must be shuffled:
the fact side gets a random salt in [0, n), the dim side is exploded n
ways, and the join key becomes (key, salt), spreading one hot key over n
tasks. Result rows are identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: Column,
    dim_key: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on key equality with an n-way salt on the fact side.

    The dim side is replicated n_salts times (explode of a literal
    sequence) — acceptable when dim << fact, which is exactly the skewed
    case this targets.

    Only ``inner`` and ``left`` are supported: with the dim side
    replicated, a right/full outer join would emit each *unmatched* dim
    row once per salt instead of once, silently multiplying rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated dim side would duplicate unmatched rows under "
            "right/full outer semantics"
        )
    salted_fact = fact.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_fact.join(
        replicated_dim,
        (fact_key == dim_key) & (salted_fact[SALT_COL] == replicated_dim[SALT_COL]),
        how,
    )
    return joined.drop(SALT_COL)
