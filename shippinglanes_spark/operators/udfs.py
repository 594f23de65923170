"""SURVEY §2.11 — UDF / UDAF surface.

When built-ins genuinely can't express the logic, the engine drops to
Arrow-batched pandas execution — never row-at-a-time Python UDFs:

- `udf_scalar_pandas`: vectorized scalar UDF (`@pandas_udf`), one Arrow
  batch per invocation.
- `udaf_grouped`: grouped custom aggregate via `applyInPandas` (per-user
  OLS trend). DuckDB's `regr_slope` is the exact oracle.

(The UDTF row is `udtf_explode` in functions/text.py — Spark's built-in
`posexplode` covers the table-function semantics without leaving the JVM.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..core import epoch_us
from ..io import table
from ..registry import register


def _normalize_text_udf():
    # pandas_udf needs an active SparkContext; build lazily at query time.
    @pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        """Vectorized normalization: lower, trim, squeeze whitespace runs."""
        return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)

    return normalize


@register(
    "udf_scalar_pandas",
    section="2.11",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
    FROM documents
    """,
    notes="Arrow-batched scalar UDF; oracle replicates the normalization in SQL",
)
def udf_scalar_pandas(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", _normalize_text_udf()(F.col("text")).alias("norm"))


@register(
    "udaf_grouped",
    section="2.11",
    oracle="""
    SELECT user_id,
           ROUND(regr_slope(value, epoch_us(ts) / 86400000000.0), 6) AS slope
    FROM events GROUP BY user_id
    """,
    notes="per-user OLS trend of value over time (days); exact oracle via regr_slope",
)
def udaf_grouped(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "value",
        (epoch_us("ts") / F.lit(86400000000.0)).alias("ts_days"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["ts_days"].to_numpy(dtype=np.float64)
        y = pdf["value"].to_numpy(dtype=np.float64)
        xc = x - x.mean()
        denom = float((xc * xc).sum())
        slope = round(float((xc * (y - y.mean())).sum() / denom), 6) if denom > 0 else None
        return pd.DataFrame({"user_id": [pdf["user_id"].iloc[0]], "slope": [slope]})

    return e.groupBy("user_id").applyInPandas(fit, schema="user_id long, slope double")
