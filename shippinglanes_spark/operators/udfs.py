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

from collections.abc import Iterator

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
    # Round 12 (§4.5 once-per-task state, §2.3 dispatch cost): the
    # custom aggregate runs as ONE mapInPandas pass over hash-
    # repartitioned partitions instead of groupBy().applyInPandas —
    # the latter dispatched a separate pandas frame + Python call per
    # user (~10k tiny groups), which was nearly all of the query's
    # cost. Same shuffle (hash on user_id, so every group is complete
    # within its partition); the per-group numpy expressions are the
    # applyInPandas `fit` body unchanged (same values, same slice
    # order via a stable sort, numpy pairwise summation depends only
    # on slice length), so each group's float path is bit-identical.
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "value",
        (epoch_us("ts") / F.lit(86400000000.0)).alias("ts_days"),
    )

    def fit_partition(batches):
        import numpy as np
        import pandas as pd

        frames = list(batches)
        if not frames:
            return
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames)
        if not len(pdf):
            return
        uid = pdf["user_id"].to_numpy()
        x = pdf["ts_days"].to_numpy(dtype=np.float64)
        y = pdf["value"].to_numpy(dtype=np.float64)
        order = np.argsort(uid, kind="stable")
        uid, x, y = uid[order], x[order], y[order]
        bounds = np.flatnonzero(
            np.r_[True, uid[1:] != uid[:-1], True]
        )
        users = []
        slopes = []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            xg = x[lo:hi]
            yg = y[lo:hi]
            xc = xg - xg.mean()
            denom = float((xc * xc).sum())
            slopes.append(
                round(float((xc * (yg - yg.mean())).sum() / denom), 6)
                if denom > 0
                else None
            )
            users.append(uid[lo])
        yield pd.DataFrame({"user_id": users, "slope": slopes})

    return e.repartition("user_id").mapInPandas(
        fit_partition, schema="user_id long, slope double"
    )


@register(
    "udtf_python",
    section="2.11",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, '.'),
                                        x -> trim(x)),
                         x -> x <> '') AS sents
      FROM documents)
    SELECT doc_id,
           CAST(i AS BIGINT) AS sent_idx,
           CAST(len(string_split(sents[i], ' ')) AS BIGINT) AS n_words
    FROM s, LATERAL (SELECT UNNEST(range(1, len(sents) + 1)) AS i)
    """,
    notes="real Python UDTF (Spark 4 @udtf API): sentence splitter "
    "emitting (sent_idx, n_words) per input row via a lateral join. "
    "Declared for API-surface parity — the engine's guidance stands "
    "that posexplode/builtin lateral views (udtf_explode) are the fast "
    "path; a Python UDTF executes row-at-a-time and belongs only where "
    "per-row logic genuinely needs imperative Python",
)
def udtf_python(spark, sf_dir):
    """Table-function surface via the first-class UDTF API: one input
    row fans out to one row per sentence. The implementation is
    deliberately simple (split on '.', trim, count words) so the DuckDB
    oracle can replicate it exactly; the point under test is the
    UDTF-with-lateral-join plumbing, not NLP."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx bigint, n_words bigint")
    class SentenceSplit:
        def eval(self, text: str):
            sents = [s.strip() for s in (text or "").split(".")]
            idx = 0
            for s in sents:
                if s:
                    idx += 1
                    yield idx, len(s.split(" "))

    spark.udtf.register("sentence_split", SentenceSplit)
    d = table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.n_words
        FROM udtf_docs_in d,
             LATERAL sentence_split(d.text) s
        """
    )


@register(
    "agg_ab_test",
    section="2.4",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                      * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s2
      FROM events
      WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type),
    w AS (
      SELECT
        (SELECT CAST(s1 AS DOUBLE) / n / 100 FROM g
          WHERE event_type = 'purchase') AS m1,
        (SELECT CAST(s1 AS DOUBLE) / n / 100 FROM g
          WHERE event_type = 'click') AS m2,
        (SELECT (CAST(s2 AS DOUBLE) / 10000
                 - (CAST(s1 AS DOUBLE) / n / 100)
                   * (CAST(s1 AS DOUBLE) / n / 100) * n) / (n - 1) / n
           FROM g WHERE event_type = 'purchase') AS v1n,
        (SELECT (CAST(s2 AS DOUBLE) / 10000
                 - (CAST(s1 AS DOUBLE) / n / 100)
                   * (CAST(s1 AS DOUBLE) / n / 100) * n) / (n - 1) / n
           FROM g WHERE event_type = 'click') AS v2n)
    SELECT FLOOR((m1 - m2) / SQRT(v1n + v2n) * 1000000) / 1000000.0 AS t_stat,
           FLOOR((m1 - m2) * 1000000) / 1000000.0 AS mean_diff
    FROM w
    """,
    notes="Welch two-sample t statistic (purchase vs click values) "
    "computed in closed form from per-group (n, sum, sum-of-squares) — "
    "the one-pass mergeable-statistics shape. Sums integerized (cents) "
    "so accumulation order is irrelevant; the float formula chain is "
    "identical on both engines, output floor-disciplined",
)
def agg_ab_test(spark, sf_dir):
    """A/B-style comparison without collecting anything: each arm
    reduces to three mergeable integers (count, sum, sum of squares);
    the t statistic is driver-free arithmetic on the 2-row aggregate.
    The same shape extends to any number of arms or metrics in one
    scan."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("long").alias("s1"),
            F.sum(cents * cents).cast("long").alias("s2"),
        )
    )
    m = F.col("s1").cast("double") / F.col("n") / 100
    varmean = (
        (F.col("s2").cast("double") / 10000 - m * m * F.col("n"))
        / (F.col("n") - 1)
        / F.col("n")
    )
    stats = g.select("event_type", m.alias("m"), varmean.alias("vn"))
    p = stats.where(F.col("event_type") == "purchase").select(
        F.col("m").alias("m1"), F.col("vn").alias("v1n")
    )
    c = stats.where(F.col("event_type") == "click").select(
        F.col("m").alias("m2"), F.col("vn").alias("v2n")
    )
    return p.crossJoin(c).select(
        (
            F.floor(
                (F.col("m1") - F.col("m2"))
                / F.sqrt(F.col("v1n") + F.col("v2n"))
                * 1000000
            )
            / 1000000.0
        ).alias("t_stat"),
        (F.floor((F.col("m1") - F.col("m2")) * 1000000) / 1000000.0).alias(
            "mean_diff"
        ),
    )


@register(
    "udf_sql_function",
    section="2.11",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT)
             AS charge_cents
    FROM lineitem GROUP BY l_returnflag
    """,
    notes="SQL scalar UDF (CREATE FUNCTION ... RETURN expr) — the "
    "catalog-managed function surface: the body is a plain expression, "
    "so Catalyst INLINES it into whole-stage codegen (no Python, no "
    "serialization boundary — unlike udf_scalar_pandas). Oracle inlines "
    "the same expression; exact integer cents",
)
def udf_sql_function(spark, sf_dir):
    from ..io import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION line_charge_cents(
            p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS BIGINT
        RETURN CAST(ROUND(p * (1 - d) * (1 + t) * 100) AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(line_charge_cents(l_extendedprice, l_discount,
                                          l_tax)) AS BIGINT) AS charge_cents
        FROM lineitem GROUP BY l_returnflag
        """
    )


@register(
    "udf_iter_pandas",
    section="2.11",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * 100) / 100.0
             AS net_price
    FROM lineitem WHERE l_quantity > 45
    """,
    notes="ITERATOR-form pandas UDF (Iterator[Series] -> Iterator[Series]) "
    "— same Arrow batching as the scalar form but the iterator contract "
    "lets expensive per-executor init (model load, dictionary mmap) "
    "happen once per partition instead of once per batch; the shape "
    "model-scoring UDFs use",
)
def udf_iter_pandas(spark, sf_dir):
    # Iterator/pd must be MODULE globals: `from __future__ import
    # annotations` stringifies the hints and pandas_udf resolves them
    # against the function's globals, not its closure
    @pandas_udf("double")
    def net(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # per-partition init happens HERE (once), not per batch
        import numpy as np

        factor = 1.0
        # floor-discipline, not round: pandas rounds half-even, DuckDB
        # scaled-multiplies — floor(x*100)/100 is exact IEEE on both
        for s in batches:
            yield np.floor(s * factor * 100.0) / 100.0

    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    raw = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey", "l_linenumber", net(raw).alias("net_price")
    )


@register(
    "udf_map_arrow",
    section="2.11",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders GROUP BY o_orderpriority
    """,
    notes="mapInArrow: the zero-copy RecordBatch-level Python boundary — "
    "below pandas (no Series materialization, no index bookkeeping), "
    "the fastest path for columnar Python libs (pyarrow.compute, "
    "polars). Here a per-batch pyarrow.compute integerization feeds a "
    "normal JVM aggregate",
)
def udf_map_arrow(spark, sf_dir):
    def cents_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            t = pa.table(batch)
            cents = pc.cast(
                pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [t["o_orderpriority"].combine_chunks(), cents.combine_chunks()
                 if hasattr(cents, "combine_chunks") else cents],
                names=["o_orderpriority", "cents"],
            )

    o = table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    mapped = o.mapInArrow(
        cents_batches, schema="o_orderpriority string, cents long"
    )
    return mapped.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )


@register(
    "udtf_analyze",
    section="2.11",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents)
    SELECT doc_id, toks[1] AS tok_1, toks[2] AS tok_2, toks[3] AS tok_3
    FROM t
    """,
    notes="POLYMORPHIC Python UDTF (Spark 4 static analyze): the output "
    "schema (tok_1..tok_k) is computed at plan time from the literal k "
    "argument — the table function changes shape with its arguments, "
    "which no fixed returnType UDTF or lateral view can express. The "
    "analyze hook runs on the driver during resolution, so the "
    "dynamic schema costs nothing per row; eval stays the documented "
    "slow path (row-at-a-time Python) and the oracle's list-index "
    "formulation is what production code should use when k is static",
)
def udtf_analyze(spark, sf_dir):
    """Spark 4 UDTF with `analyze`: schema derived from the constant k.
    Out-of-range positions yield NULL, matching SQL list indexing."""
    from pyspark.sql.functions import (
        AnalyzeArgument,
        AnalyzeResult,
        udtf,
    )
    from pyspark.sql.types import StringType, StructType

    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument):
            schema = StructType()
            for i in range(k.value):
                schema = schema.add(f"tok_{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, k: int):
            toks = (text or "").split(" ")
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(k)
            )

    spark.udtf.register("first_tokens", udtf(FirstTokens))
    d = table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_analyze_in")
    return spark.sql(
        """
        SELECT d.doc_id, s.tok_1, s.tok_2, s.tok_3
        FROM udtf_analyze_in d,
             LATERAL first_tokens(d.text, 3) s
        """
    )


@register(
    "udf_arrow_scalar",
    section="2.11",
    oracle="""
    SELECT p_partkey,
           CAST(CAST(ROUND(p_retailprice * 100) AS BIGINT)
                * (100 - CAST(p_size AS BIGINT) % 20) // 100 AS BIGINT)
             AS discounted_cents
    FROM part WHERE p_partkey <= 1000
    """,
    notes="Arrow-optimized Python UDF (Spark 4 useArrow=True): the "
    "row-at-a-time pickle path replaced by Arrow batch transfer "
    "WITHOUT rewriting the function as a pandas UDF — the migration "
    "story for existing scalar-UDF code. Integer-exact size-banded "
    "discount so the SQL oracle replays it bit-for-bit; the engine's "
    "guidance stands that built-in expressions beat ANY Python UDF "
    "where expressible — this row exists to prove the surface",
)
def udf_arrow_scalar(spark, sf_dir):
    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def discount(cents: int, size: int) -> int:
        return cents * (100 - size % 20) // 100

    p = table(spark, sf_dir, "part").where(F.col("p_partkey") <= 1000)
    return p.select(
        "p_partkey",
        discount(
            F.round(F.col("p_retailprice") * 100).cast("long"),
            F.col("p_size").cast("long"),
        ).alias("discounted_cents"),
    )
