"""SURVEY §2.9 extensions — corpus-curation signals (round 3).

Repetition and boilerplate are the two classic text-quality axes a
training-data pipeline filters on (C4 / Gopher style):

- within-doc repetition: fraction of duplicated word n-grams and the
  most-frequent-token share. Pure per-row higher-order array functions —
  no shuffle at all, embarrassingly parallel at any scale.
- cross-doc boilerplate: shingles shared by many documents (headers,
  navigation chrome, license blurbs). Shape = one distinct + two hash
  aggregations + one equi-join on shingle — the same bucketed join
  pattern as MinHash dedup, so cost scales with corpus size, never n².

Both carry full DuckDB value oracles. `agg_approx_topk` declares the
Spark 4 `approx_top_k` sketch aggregate; over a low-cardinality key the
sketch is exact, so it too gets a full value oracle (the sketch's scale
story — mergeable partial states — is Catalyst's, not ours).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import fan_out
from ..io import table
from ..registry import register
from .text import shingles

# A shingle seen in at least this many distinct documents counts as
# boilerplate (fixture p99 doc-frequency is 4; real corpora use a
# per-domain threshold).
BOILERPLATE_MIN_DOCS = 5


@register(
    "text_repetition",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, toks,
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1]) AS g2,
            list_transform(range(1, greatest(len(toks) - 1, 1)),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
          FROM t)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(list_max(list_transform(list_distinct(toks),
                 u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE)
                 / len(toks), 4) AS top_tok_frac,
           ROUND(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                 / greatest(len(g2), 1), 4) AS dup2_frac,
           ROUND(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
                 / greatest(len(g3), 1), 4) AS dup3_frac
    FROM g
    """,
    notes="Gopher/C4 within-doc repetition: duplicated 2/3-gram fraction + "
    "top-token share; per-row array math, zero shuffles",
)
def text_repetition(spark, sf_dir):
    # INTEGER counting happens in one vectorized-boundary Arrow pass
    # (dict/set work is C-speed per doc); every FLOAT expression — the
    # three ROUND(... / ...) columns — stays in the JVM, byte-identical
    # to the previous form, so there is no Python float surface at all.
    #
    # Why not pure Catalyst: the previous form (array_sort + aggregate
    # fold + two array_distinct HOFs per row) evaluated INTERPRETED and
    # was BIMODAL under JIT — measured 1.08-1.58 s steady but 4.1 s
    # (driver r11 sweep), 5.76 s and 11.2 s (r12 clean-JVM/in-sweep)
    # when the generated/interpreted path failed to reach C2. The
    # counting pass removes the giant expression tree outright.
    #
    # Counting replicas (rows certified by the unchanged DuckDB oracle
    # and the A/B equivalence test):
    # - tokens: Python text.split(" ") == F.split(text, " ") (Spark uses
    #   Java split with limit -1: trailing empties kept, same as Python).
    # - top_count: max token multiplicity == the old sorted-run fold.
    # - k-gram lists replicate shingles(): empty below k tokens, else
    #   " ".join over a sliding window (concat_ws == join: no nulls).
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))

    def _counts(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "n_tokens": [],
                "top_count": [],
                "d2": [],
                "l2": [],
                "d3": [],
                "l3": [],
            }
            for t in pdf["text"]:
                if t is None:
                    # NULL text: size(NULL)=NULL and every derived column
                    # is NULL — replicate the propagation
                    for k in ("n_tokens", "top_count", "d2", "l2", "d3", "l3"):
                        out[k].append(None)
                    continue
                toks = t.split(" ")
                n = len(toks)
                out["n_tokens"].append(n)
                out["top_count"].append(max(Counter(toks).values()))
                g2 = (
                    [" ".join(toks[i : i + 2]) for i in range(n - 1)]
                    if n >= 2
                    else []
                )
                g3 = (
                    [" ".join(toks[i : i + 3]) for i in range(n - 2)]
                    if n >= 3
                    else []
                )
                out["d2"].append(len(set(g2)))
                out["l2"].append(len(g2))
                out["d3"].append(len(set(g3)))
                out["l3"].append(len(g3))
            yield pd.DataFrame(out)

    c = d.mapInPandas(
        _counts,
        schema="doc_id long, n_tokens long, top_count long, "
        "d2 long, l2 long, d3 long, l3 long",
    )
    dup_frac = lambda dcol, lcol: F.round(
        1.0
        - F.col(dcol).cast("double") / F.greatest(F.col(lcol), F.lit(1)),
        4,
    )
    return c.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("top_count").cast("double") / F.col("n_tokens"), 4
        ).alias("top_tok_frac"),
        dup_frac("d2", "l2").alias("dup2_frac"),
        dup_frac("d3", "l3").alias("dup3_frac"),
    )


@register(
    "text_boilerplate",
    section="2.9",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t),
    df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS nd FROM sh GROUP BY shingle),
    j AS (SELECT sh.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_shingles,
                 CAST(COUNT(*) FILTER (WHERE df.nd >= {BOILERPLATE_MIN_DOCS})
                      AS BIGINT) AS n_bp
          FROM sh JOIN df USING (shingle) GROUP BY sh.doc_id)
    SELECT doc_id, n_shingles,
           ROUND(CAST(n_bp AS DOUBLE) / n_shingles, 4) AS bp_frac
    FROM j
    """,
    notes="cross-doc boilerplate: per-doc fraction of distinct 3-gram "
    "shingles shared by >= 5 documents; distinct + two hash aggs + one "
    "shingle equi-join — corpus-linear, the bucketed dedup shape",
)
def text_boilerplate(spark, sf_dir):
    from .text import shingles_of_tokens

    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = (
        d.select("doc_id", F.split("text", " ").alias("__toks"))
        .select(
            "doc_id",
            F.explode(shingles_of_tokens(F.col("__toks"))).alias("shingle"),
        )
        .where(F.col("shingle") != "")
        .distinct()
    )
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("nd"))
    return (
        sh.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("nd") >= BOILERPLATE_MIN_DOCS, 1)).alias("n_bp"),
        )
        .select(
            "doc_id",
            "n_shingles",
            F.round(
                F.col("n_bp").cast("double") / F.col("n_shingles"), 4
            ).alias("bp_frac"),
        )
    )


@register(
    "agg_approx_topk",
    section="2.4",
    oracle="""
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, item LIMIT 3
    """,
    notes="Spark 4 approx_top_k sketch aggregate, exploded to rows; over a "
    "5-value key the sketch tracks every item so it equals the exact "
    "top-3 (counts at the k boundary are distinct in the fixtures)",
)
def agg_approx_topk(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(F.expr("approx_top_k(event_type, 3)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("n"),
        )
        .orderBy(F.desc("n"), "item")
    )


@register(
    "text_entropy",
    section="2.9",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
    c AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY doc_id, tok),
    s AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                 SUM(c * LN(c)) AS sclnc
          FROM c GROUP BY doc_id)
    SELECT doc_id, n AS n_tokens,
           ROUND(LN(n) - sclnc / n, 4) AS entropy
    FROM s
    """,
    notes="per-doc Shannon token entropy H = ln(n) - sum(c ln c)/n — the "
    "gibberish/repetition quality signal; two partial-agg-combinable "
    "groupBys, identical IEEE formula both engines (entropy values are "
    "irrational, so the 4dp round is boundary-safe)",
)
def text_entropy(spark, sf_dir):
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    c = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        c.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.log("c")).alias("sclnc"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.log("n_tokens") - F.col("sclnc") / F.col("n_tokens"), 4
            ).alias("entropy"),
        )
    )


@register(
    "text_ngram_novelty",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                    AS shingle
           FROM t),
    first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_seen_before,
           CAST(FLOOR(1000000.0 *
                SUM(CASE WHEN f.first_doc < s.doc_id THEN 0 ELSE 1 END)
                / COUNT(*)) AS BIGINT) AS novelty_ppm
    FROM sh s JOIN first f ON s.shingle = f.shingle
    GROUP BY s.doc_id
    """,
    notes="corpus-order n-gram novelty scoring (the streaming-curation "
    "signal: how much of each document's content already appeared in "
    "earlier documents): per-doc distinct 3-gram shingles, global "
    "first-occurrence doc per shingle, novelty = fraction of shingles "
    "this doc introduces, exact integer ppm. Two hash aggregates + one "
    "shingle-keyed equi-join — the identical bucketed shape as "
    "text_boilerplate, corpus-linear; the explode uses the two-step "
    "tokenize-then-shingle form (HOF-under-Generate is ~10x slower). "
    "FLOOR keeps the ratio cross-engine exact (no double rounding)",
)
def text_ngram_novelty(spark, sf_dir):
    from .text import shingles_of_tokens

    d = table(spark, sf_dir, "documents")
    sh = (
        fan_out(d.select("doc_id", "text"))
        .select("doc_id", F.split("text", " ").alias("__toks"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles_of_tokens(F.col("__toks")))
            ).alias("shingle"),
        )
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    seen = F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(seen).cast("long").alias("n_seen_before"),
            F.floor(
                1000000.0 * F.sum(1 - seen) / F.count(F.lit(1))
            ).cast("long").alias("novelty_ppm"),
        )
    )


@register(
    "text_readability",
    section="2.9",
    oracle="""
    WITH x AS (SELECT doc_id,
                      CAST(len(regexp_extract_all(
                        trim(text), '[^ ]+')) AS BIGINT) AS words,
                      CAST(GREATEST(len(regexp_extract_all(
                        text, '[.!?]')), 1) AS BIGINT) AS sentences,
                      CAST(GREATEST(len(regexp_extract_all(
                        lower(text), '[aeiouy]+')), 1) AS BIGINT)
                        AS syllables
               FROM documents
               WHERE length(trim(text)) > 0)
    SELECT doc_id, words, sentences, syllables,
           FLOOR((206.835
                  - 1.015 * (CAST(words AS DOUBLE) / sentences)
                  - 84.6 * (CAST(syllables AS DOUBLE) / words)) * 1e4)
             / 1e4 AS flesch
    FROM x WHERE words > 0
    """,
    notes="Flesch reading-ease per document — the classic readability "
    "gate a curation pipeline runs next to Gopher rules: words, "
    "sentence marks, and vowel-group syllable approximation are all "
    "integer regexp counts (engine-deterministic, no tokenizer "
    "dependency), and the score formula runs on exact integers with "
    "identical association on both engines. Pure per-row compute — "
    "zero shuffles, embarrassingly parallel at any corpus size",
)
def text_readability(spark, sf_dir):
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    x = d.where(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.expr("size(regexp_extract_all(trim(text), '[^ ]+', 0))")
        .cast("long")
        .alias("words"),
        F.greatest(
            F.expr("size(regexp_extract_all(text, '[.!?]', 0))"), F.lit(1)
        )
        .cast("long")
        .alias("sentences"),
        F.greatest(
            F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"),
            F.lit(1),
        )
        .cast("long")
        .alias("syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words").cast("double") / F.col("sentences"))
        - F.lit(84.6) * (F.col("syllables").cast("double") / F.col("words"))
    )
    return x.where(F.col("words") > 0).select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        (F.floor(flesch * 1e4) / 1e4).alias("flesch"),
    )
