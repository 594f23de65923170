"""Round-6 LLM-data-curation pack.

`pipeline_dsir`: Data Selection via Importance Resampling (Xie et al.
2023) — the published recipe for picking pretraining documents that
look like a target distribution: fit two hashed-n-gram bag models
(target corpus vs raw corpus), weight every raw document by its
log-likelihood ratio, keep the high-ratio tail. The distributed shape
is exactly two corpus passes:

- pass 1: hashed-bigram counts per bucket (one map-side-combined
  aggregate; the bucket table is FEATURE-sized — 1024 rows — never
  corpus-sized);
- pass 2: per-document score = sum of its bigrams' bucket log-ratios
  (join against the broadcast bucket table, one keyed aggregate).

Cross-engine float discipline: bucket log-ratios are FLOORed to 1e-6
integers BEFORE the per-document sum (the emb_isotropy quantization
pattern), so document scores are exact BIGINTs in both engines; the
Laplace-smoothed ratio inside the FLOOR is one identical expression
tree over exact counts. Bucketing is content-addressed md5 (the
etl_surrogate_keys idiom), so assignments are reproducible across
engines, reruns, and backfills.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from ..registry import register
from .text import shingles_of_tokens

_DSIR_B = 1024  # hashed feature buckets
_DSIR_SALT = "dsir:"


@register(
    "pipeline_dsir",
    section="2.13",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
               FROM documents),
    bg AS (SELECT doc_id, lang,
                  unnest(list_transform(
                    range(1, greatest(len(toks), 1)),
                    i -> toks[i] || ' ' || toks[i+1])) AS b
           FROM t),
    hb AS (SELECT doc_id, lang,
                  ('0x' || substr(md5('{_DSIR_SALT}' || b), 1, 4))::BIGINT
                    % {_DSIR_B} AS bucket
           FROM bg),
    cnt AS (SELECT bucket,
                   CAST(COUNT(*) AS BIGINT) AS cr,
                   CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS ct
            FROM hb GROUP BY bucket),
    tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS r,
                   CAST(SUM(ct) AS BIGINT) AS tt
            FROM cnt),
    llr AS (SELECT bucket,
                   CAST(FLOOR((LN((ct + 1.0) / (tt + {_DSIR_B}))
                               - LN((cr + 1.0) / (r + {_DSIR_B}))) * 1e6)
                        AS BIGINT) AS lm
            FROM cnt CROSS JOIN tot),
    ds AS (SELECT h.doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                  CAST(SUM(l.lm) AS BIGINT) AS score_micro
           FROM hb h JOIN llr l USING (bucket)
           GROUP BY h.doc_id)
    SELECT d.doc_id, d.lang,
           COALESCE(s.n_bigrams, 0) AS n_bigrams,
           COALESCE(s.score_micro, 0) AS score_micro,
           CAST(CASE WHEN COALESCE(s.score_micro, 0) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS selected
    FROM documents d LEFT JOIN ds s ON s.doc_id = d.doc_id
    """,
    notes=f"DSIR importance weights (hashed-bigram LM ratio, B="
    f"{_DSIR_B} buckets, Laplace smoothing) of every document against "
    "the English-subset target distribution: score = sum over the "
    "doc's bigrams of ln p_target(bucket) - ln p_raw(bucket). Bucket "
    "log-ratios are 1e-6-quantized integers (emb_isotropy pattern) so "
    "per-doc sums are exact BIGINTs; md5 bucketing is content-"
    "addressed and engine-identical. Two corpus passes + one broadcast "
    "of the 1024-row feature table — the shape that holds when the "
    "raw corpus is 100 TB and the target is a curated sliver. "
    "selected=1 marks docs that look more target-like than raw-like",
)
def pipeline_dsir(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )
    hb = (
        toks.select(
            "doc_id",
            "lang",
            F.explode(shingles_of_tokens(F.col("toks"), 2)).alias("b"),
        )
        .select(
            "doc_id",
            "lang",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(_DSIR_SALT), F.col("b"))), 1, 4
                    ),
                    16,
                    10,
                ).cast("long")
                % _DSIR_B
            ).alias("bucket"),
        )
        .localCheckpoint()
    )
    cnt = hb.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cr"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("long").alias("ct"),
    )
    tot = cnt.agg(
        F.sum("cr").cast("long").alias("r"),
        F.sum("ct").cast("long").alias("tt"),
    )
    llr = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.floor(
            (
                F.log((F.col("ct") + 1.0) / (F.col("tt") + _DSIR_B))
                - F.log((F.col("cr") + 1.0) / (F.col("r") + _DSIR_B))
            )
            * 1e6
        )
        .cast("long")
        .alias("lm"),
    )
    ds = (
        hb.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("lm").cast("long").alias("score_micro"),
        )
    )
    return d.join(ds, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
            "n_bigrams"
        ),
        F.coalesce(F.col("score_micro"), F.lit(0)).cast("long").alias(
            "score_micro"
        ),
        F.when(F.coalesce(F.col("score_micro"), F.lit(0)) > 0, 1)
        .otherwise(0)
        .cast("long")
        .alias("selected"),
    )
