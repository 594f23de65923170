"""SURVEY §2.9 — text analysis operators over `documents`.

Training-data-pipeline text ops: tokenization/TF, corpus stats, quality
scoring, language ID (stopword heuristic), exact-dup fingerprinting.
All are built-in expressions (split/explode/length/md5) — the shapes that
stay cheap at 100 TB: tokenize+count is map-side-combined groupBy; the
fingerprint dedup is a hash-groupBy carrying only (hash, count).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "text_tokenize_tf",
    section="2.9",
    oracle="""
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token
                 FROM documents)
    SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok WHERE token <> '' GROUP BY lang, token HAVING COUNT(*) >= 5
    """,
)
def text_tokenize_tf(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .where(F.col("tf") >= 5)
    )


@register(
    "text_stats",
    section="2.9",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(CASE WHEN n_chars = LENGTH(text) THEN 0 ELSE 1 END) AS BIGINT)
             AS n_mismatch
    FROM documents GROUP BY source
    """,
)
def text_stats(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(
            F.when(F.col("n_chars") == F.length("text"), 0).otherwise(1)
        ).alias("n_mismatch"),
    )


@register(
    "text_quality",
    section="2.9",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_words,
           ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / LENGTH(text), 4) AS alpha_ratio,
           CAST(CASE WHEN LENGTH(text) BETWEEN 50 AND 5000 THEN 1 ELSE 0 END AS INT)
             AS len_ok
    FROM documents
    """,
    notes="quality scoring: length / word-count / whitespace-density heuristics",
)
def text_quality(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    tlen = F.length("text")
    nospace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return d.select(
        "doc_id",
        tlen.cast("long").alias("n_chars_calc"),
        (tlen - nospace + 1).cast("long").alias("n_words"),
        F.round(nospace.cast("double") / tlen, 4).alias("alpha_ratio"),
        F.when(tlen.between(50, 5000), 1).otherwise(0).cast("int").alias("len_ok"),
    )


@register(
    "text_fingerprint",
    section="2.9",
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS fp
    FROM documents
    """,
    notes="document fingerprint = md5 of normalized text; basis of exact dedup",
)
def text_fingerprint(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    )


@register(
    "dedup_exact",
    section="2.9",
    oracle="""
    SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper
    FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents)
    GROUP BY fp HAVING COUNT(*) > 1
    """,
    notes="exact dedup via hash-groupBy; fixtures have 0 dups -> 0 rows (planted-dup edge cases in tests)",
)
def dedup_exact(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper"),
        )
        .where(F.col("n_copies") > 1)
    )
