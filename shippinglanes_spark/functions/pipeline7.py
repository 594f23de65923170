"""Round-8 curation pack: nucleus-style source selection.

`pipeline_topp_sources`: the corpus-mix analogue of top-p (nucleus)
sampling — per language, rank sources by document volume and keep the
smallest prefix covering >= P of the corpus, dropping the long tail of
scraps. This is how a pretraining mix sheds the thousands of domains
that each contribute a handful of documents: the keep/drop decision is
an exact integer cross-multiply (cum_before * 10 < 9 * total for
P = 0.9), never a float share.

Scale notes (100 TB): one (lang, source)-keyed corpus rollup; the
ranking window runs over the per-language SOURCE list (vocabulary-
sized, not corpus-sized), so at any scale only the first aggregate
grows.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

# keep sources until cumulative coverage reaches _TOPP_NUM/_TOPP_DEN
_TOPP_NUM = 9
_TOPP_DEN = 10


@register(
    "pipeline_topp_sources",
    section="2.14",
    oracle=f"""
    WITH m AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1, 2),
    t AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS tot
          FROM m GROUP BY lang),
    r AS (
      SELECT m.lang, m.source, m.n_docs, t.tot,
             CAST(SUM(m.n_docs) OVER (PARTITION BY m.lang
                        ORDER BY m.n_docs DESC, m.source) AS BIGINT) AS cum
      FROM m JOIN t USING (lang))
    SELECT lang, source, n_docs,
           CAST(cum * 1000000 // tot AS BIGINT) AS cum_ppm,
           (cum - n_docs) * {_TOPP_DEN} < {_TOPP_NUM} * tot AS kept
    FROM r
    ORDER BY lang, n_docs DESC, source
    """,
    notes=f"nucleus (top-p) source selection per language at "
    f"P = {_TOPP_NUM}/{_TOPP_DEN}: sources ranked by document volume "
    f"(source-name tiebreak), kept while the cumulative share BEFORE "
    f"the source is under P — so the crossing source is kept and the "
    f"tail dropped, exactly nucleus sampling's prefix rule. The "
    f"keep/drop verdict is the integer cross-multiply "
    f"(cum - n) * {_TOPP_DEN} < {_TOPP_NUM} * tot (the SPRT/CUSUM "
    f"discipline), cumulative coverage an integer ppm division. The "
    f"corpus-curation sibling of pipeline_domain_mix (caps per "
    f"domain) and pipeline_mixture_temperature (reweights): top-p "
    f"TRUNCATES the tail. One corpus rollup; windows run over the "
    f"vocabulary-sized source list",
)
def pipeline_topp_sources(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    m = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).localCheckpoint()  # source-list sized, read twice (totals + rank)
    t = m.groupBy("lang").agg(F.sum("n_docs").cast("long").alias("tot"))
    w = W.partitionBy("lang").orderBy(
        F.col("n_docs").desc(), F.col("source")
    ).rowsBetween(W.unboundedPreceding, 0)
    r = m.join(F.broadcast(t), "lang").withColumn(
        "cum", F.sum("n_docs").over(w).cast("long")
    )
    return r.select(
        "lang",
        "source",
        "n_docs",
        F.expr("CAST(cum * 1000000 div tot AS BIGINT)").alias("cum_ppm"),
        (
            (F.col("cum") - F.col("n_docs")) * _TOPP_DEN
            < _TOPP_NUM * F.col("tot")
        ).alias("kept"),
    ).orderBy("lang", F.col("n_docs").desc(), "source")
