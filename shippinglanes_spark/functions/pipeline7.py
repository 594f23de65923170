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


# Heaps' law: V = K * N^beta over word-TRIGRAM vocabulary. Ten prefix
# points (decile edges over doc_id), log-log OLS for beta. Logs are
# ROUNDed 4dp before the fit (ln is libm-variant — the text_logodds
# discipline); the four OLS moment sums fold in point order so the
# doubles are bit-identical. The unit is the trigram, NOT the word:
# the synthetic corpus's word vocabulary (~60 db/Spark terms) saturates
# inside the first decile, which flattens the word-level curve to
# beta = 0 (caught by this query's own python-reference test before
# registration) — trigram types keep minting for the whole corpus,
# so the growth law has something to measure.
_HEAPS_POINTS = 10


@register(
    "text_heaps_law",
    section="2.13",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             GREATEST(len(string_split(text, ' ')) - 2, 0) AS n_tok
      FROM documents),
    tok AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents)),
    firsts AS (
      SELECT token, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM tok GROUP BY token),
    e AS (SELECT [{", ".join(
        f"percentile_disc({k / _HEAPS_POINTS}) WITHIN GROUP (ORDER BY doc_id)"
        for k in range(1, _HEAPS_POINTS + 1)
    )}] AS edges FROM docs),
    nb AS (SELECT CAST(len(list_filter(e.edges, q -> q < d.doc_id))
                       AS BIGINT) AS b,
                  CAST(SUM(d.n_tok) AS BIGINT) AS toks,
                  CAST(COUNT(*) AS BIGINT) AS docs
           FROM docs d CROSS JOIN e GROUP BY 1),
    vb AS (SELECT CAST(len(list_filter(e.edges, q -> q < f.first_doc))
                       AS BIGINT) AS b,
                  CAST(COUNT(*) AS BIGINT) AS vocab
           FROM firsts f CROSS JOIN e GROUP BY 1),
    pts AS (
      SELECT nb.b + 1 AS k,
             CAST(SUM(nb.toks) OVER (ORDER BY nb.b) AS BIGINT) AS n_tokens,
             CAST(SUM(nb.docs) OVER (ORDER BY nb.b) AS BIGINT) AS n_docs,
             CAST(SUM(COALESCE(vb.vocab, 0)) OVER (ORDER BY nb.b)
                  AS BIGINT) AS vocab
      FROM nb LEFT JOIN vb ON nb.b = vb.b),
    lx AS (SELECT k, n_tokens, n_docs, vocab,
                  ROUND(LN(n_tokens), 4) AS x,
                  ROUND(LN(vocab), 4) AS y
           FROM pts),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np,
             list_reduce(list_transform(list([x, y] ORDER BY k),
                                        p -> [p[1], p[2],
                                              p[1] * p[2], p[1] * p[1]]),
               (a, p) -> [a[1] + p[1], a[2] + p[2],
                          a[3] + p[3], a[4] + p[4]]) AS s
      FROM lx),
    fit AS (
      SELECT np,
             (np * s[3] - s[1] * s[2]) / (np * s[4] - s[1] * s[1]) AS beta,
             s[1] AS sx, s[2] AS sy
      FROM mom)
    SELECT l.k, l.n_docs, l.n_tokens, l.vocab, l.x AS ln_tokens,
           l.y AS ln_vocab,
           FLOOR(f.beta * 1e6) / 1e6 AS heaps_beta,
           FLOOR((f.sy - f.beta * f.sx) / f.np * 1e6) / 1e6 AS heaps_ln_k
    FROM lx l CROSS JOIN fit f
    ORDER BY l.k
    """,
    notes=f"Heaps'-law vocabulary-growth fit V = K*N^beta over "
    f"{_HEAPS_POINTS} corpus prefix points (decile edges over doc_id "
    f"— the calibration-bins broadcast-edge pattern, no global sort): "
    f"token first-occurrence is ONE token-keyed MIN(doc_id) rollup, "
    f"so vocabulary-at-prefix is a cumulative count of first-seen "
    f"buckets and tokens-at-prefix a cumulative BIGINT sum — the "
    f"whole curve from two corpus passes. The log-log OLS rounds "
    f"each ln 4dp first (libm-variant, the text_logodds discipline) "
    f"and folds the four moment sums in POINT ORDER on both engines, "
    f"so beta is bit-identical. The vocabulary-growth companion to "
    f"text_hapax_ratio (tail weight) and agg_powerlaw_fit (Zipf "
    f"exponent): sub-linear beta (~0.5) says dedup/curation is "
    f"working, beta near 1 flags boilerplate-free synthetic text. "
    f"Corpus work = the doc projection + one token rollup; "
    f"everything after is {_HEAPS_POINTS} rows",
)
def text_heaps_law(spark, sf_dir):
    from ..core import fan_out
    from .text import shingles_of_tokens

    d = table(spark, sf_dir, "documents")
    # read twice (edges + bucketing) but it's a pruned 2-column scan +
    # cheap projection: recomputing beats a checkpoint's extra driver
    # action + materialization (round-9 verdict item 2 measurement)
    docs = d.select(
        "doc_id",
        # greatest(.., 0): a doc with <3 tokens emits zero trigrams, so
        # its token contribution must clamp at 0, not go negative
        F.greatest(F.size(F.split("text", " ")) - 2, F.lit(0))
        .cast("long")
        .alias("n_tok"),
    )
    # tokenize in a SEPARATE select (the round-4 HOF-under-Generate
    # gotcha: passing split() straight into shingles_of_tokens inlines
    # it k+1 times under the explode, interpreted, no CSE — measured
    # ~4x this query's corpus stage) and fan_out the single-row-group
    # fixture scan so the explode+rollup isn't one task on 32 cores
    tokd = fan_out(d.select("doc_id", F.split("text", " ").alias("toks")))
    tok = tokd.select(
        "doc_id",
        F.explode(shingles_of_tokens(F.col("toks"), 3)).alias("token"),
    )
    firsts = tok.groupBy("token").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    qs = [k / _HEAPS_POINTS for k in range(1, _HEAPS_POINTS + 1)]
    e = docs.agg(
        F.array_sort(
            F.array(
                *[
                    F.expr(
                        f"percentile_disc({q}) WITHIN GROUP"
                        " (ORDER BY doc_id)"
                    )
                    for q in qs
                ]
            )
        ).alias("edges")
    )
    nb = (
        docs.crossJoin(F.broadcast(e))
        .select(
            F.size(F.filter("edges", lambda q: q < F.col("doc_id")))
            .cast("long")
            .alias("b"),
            "n_tok",
        )
        .groupBy("b")
        .agg(
            F.sum("n_tok").cast("long").alias("toks"),
            F.count(F.lit(1)).cast("long").alias("docs"),
        )
    )
    vb = (
        firsts.crossJoin(F.broadcast(e))
        .select(
            F.size(F.filter("edges", lambda q: q < F.col("first_doc")))
            .cast("long")
            .alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    wc = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    pts = (
        nb.join(vb, "b", "left")
        .select(
            (F.col("b") + 1).alias("k"),
            F.sum("toks").over(wc).cast("long").alias("n_tokens"),
            F.sum("docs").over(wc).cast("long").alias("n_docs"),
            F.sum(F.coalesce("vocab", F.lit(0)))
            .over(wc)
            .cast("long")
            .alias("vocab"),
        )
    )
    lx = pts.select(
        "k",
        "n_docs",
        "n_tokens",
        "vocab",
        F.round(F.log("n_tokens"), 4).alias("x"),
        F.round(F.log("vocab"), 4).alias("y"),
    ).localCheckpoint()  # 10 rows, read twice (fit + output)
    mom = lx.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.expr(
            "aggregate(transform(array_sort(collect_list("
            "struct(k, x, y))),"
            " p -> array(p.x, p.y, p.x * p.y, p.x * p.x)),"
            " array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),"
            "       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),"
            " (a, p) -> array(a[0] + p[0], a[1] + p[1],"
            "                 a[2] + p[2], a[3] + p[3]))"
        ).alias("s"),
    )
    fit = mom.select(
        "np",
        (
            (F.col("np") * F.col("s").getItem(2)
             - F.col("s").getItem(0) * F.col("s").getItem(1))
            / (F.col("np") * F.col("s").getItem(3)
               - F.col("s").getItem(0) * F.col("s").getItem(0))
        ).alias("beta"),
        F.col("s").getItem(0).alias("sx"),
        F.col("s").getItem(1).alias("sy"),
    )
    return (
        lx.crossJoin(F.broadcast(fit))
        .select(
            "k",
            "n_docs",
            "n_tokens",
            "vocab",
            F.col("x").alias("ln_tokens"),
            F.col("y").alias("ln_vocab"),
            (F.floor(F.col("beta") * 1e6) / 1e6).alias("heaps_beta"),
            (
                F.floor(
                    (F.col("sy") - F.col("beta") * F.col("sx"))
                    / F.col("np")
                    * 1e6
                )
                / 1e6
            ).alias("heaps_ln_k"),
        )
        .orderBy("k")
    )


@register(
    "text_self_bleu",
    section="2.14",
    oracle="""
    WITH tok AS (
      SELECT lang, source, string_split(text, ' ') AS toks
      FROM documents),
    tri AS (
      SELECT lang, source,
             UNNEST(list_transform(range(1, greatest(len(toks) - 1, 1)),
                    i -> toks[i] || ' ' || toks[i + 1] || ' '
                         || toks[i + 2])) AS g
      FROM tok),
    cnt AS (SELECT lang, source, g, CAST(COUNT(*) AS BIGINT) AS c
            FROM tri GROUP BY 1, 2, 3),
    tot AS (SELECT lang, g, CAST(SUM(c) AS BIGINT) AS ct
            FROM cnt GROUP BY 1, 2)
    SELECT c.lang, c.source,
           CAST(SUM(c.c) AS BIGINT) AS tri_total,
           CAST(SUM(LEAST(c.c, t.ct - c.c)) AS BIGINT) AS tri_clipped,
           CAST(SUM(LEAST(c.c, t.ct - c.c)) * 1000000 // SUM(c.c)
                AS BIGINT) AS self_bleu_ppm
    FROM cnt c JOIN tot t ON c.lang = t.lang AND c.g = t.g
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    notes="self-BLEU trigram modified precision of each (lang, source) "
    "slice against the REST of its language corpus as the reference: "
    "clipped count = LEAST(own count, reference count = language total "
    "minus own) per trigram, precision = clipped/total as an exact "
    "integer ppm division — not a float anywhere. THE corpus-diversity "
    "diagnostic for generated / scraped training data (Zhu et al. "
    "2018): a source whose trigrams all re-occur elsewhere scores "
    "~1e6 (redundant); a source minting its own phrasing scores low "
    "(fixture probe: 0.07-0.57 across sources — real spread). Scale: "
    "trigram explode is corpus-linear map work; the two aggregates "
    "and the join shuffle on (lang, trigram) — vocabulary-shaped keys "
    "with map-side partial aggregation, no all-pairs anything",
)
def text_self_bleu(spark, sf_dir):
    from pyspark.sql import Window

    from .text import shingles_of_tokens

    d = table(spark, sf_dir, "documents")
    # Tokenize in a Project BEFORE the explode so split(text) runs once
    # per document; inlining it into the transform lambda re-evaluates
    # the split per element_at (3x per trigram) in the Generate node.
    # NULL-lang rows: the old aggregate-join-back form dropped them via
    # the inner join on lang (as the oracle still does); the window form
    # would keep them as their own partition — filter explicitly so the
    # semantics stay identical on ANY data, not just the fixture.
    tri = d.where(F.col("lang").isNotNull()).select(
        "lang", "source", F.split("text", " ").alias("toks")
    ).select(
        "lang",
        "source",
        F.explode(shingles_of_tokens(F.col("toks"), 3)).alias("g"),
    )
    cnt = tri.groupBy("lang", "source", "g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # Language total per trigram as a WINDOW over the per-source counts,
    # not an aggregate joined back: the join form re-scans and re-explodes
    # the whole corpus for the build side (broadcast defeats exchange
    # reuse — two FileScans + two Generates in the plan), and broadcasts
    # a vocabulary-sized relation, which is exactly what cannot scale.
    # Window form: ONE scan, ONE explode, ct computed in place. Same
    # exact integer ct = SUM(c) OVER (lang, g).
    withct = cnt.withColumn(
        "ct", F.sum("c").over(Window.partitionBy("lang", "g"))
    )
    clipped = F.least(F.col("c"), F.col("ct") - F.col("c"))
    return (
        withct.groupBy("lang", "source")
        .agg(
            F.sum("c").cast("long").alias("tri_total"),
            F.sum(clipped).cast("long").alias("tri_clipped"),
            F.expr(
                "CAST(SUM(LEAST(c, ct - c)) * 1000000 div SUM(c) AS BIGINT)"
            ).alias("self_bleu_ppm"),
        )
        .orderBy("lang", "source")
    )


# Preference pairs: quality margin (milli-TTR units) a pair must clear
# before it's worth training on — pairs whose chosen/rejected scores
# nearly tie teach nothing and add label noise
_PP_MARGIN = 50


@register(
    "pipeline_preference_pairs",
    section="2.14",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang, source,
             CAST(len(list_distinct(string_split(text, ' '))) * 1000
                  // len(string_split(text, ' ')) AS BIGINT) AS score
      FROM documents),
    r AS (
      SELECT lang, source, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY score DESC, doc_id) AS rb,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY score ASC, doc_id) AS rw,
             CAST(COUNT(*) OVER (PARTITION BY lang, source) AS BIGINT)
               AS n_docs
      FROM s),
    best AS (SELECT lang, source, n_docs, doc_id AS chosen_doc,
                    score AS chosen_score
             FROM r WHERE rb = 1),
    worst AS (SELECT lang, source, doc_id AS rejected_doc,
                     score AS rejected_score
              FROM r WHERE rw = 1)
    SELECT b.lang, b.source, b.n_docs, b.chosen_doc, w.rejected_doc,
           b.chosen_score, w.rejected_score,
           b.chosen_score - w.rejected_score AS margin_milli
    FROM best b JOIN worst w USING (lang, source)
    WHERE b.chosen_doc <> w.rejected_doc
      AND b.chosen_score - w.rejected_score >= {_PP_MARGIN}
    ORDER BY b.lang, b.source
    """,
    notes=f"DPO/RLHF preference-pair construction from a scored corpus: "
    f"per (lang, source) bucket, the highest-quality document becomes "
    f"'chosen' and the lowest 'rejected' (quality = type-token ratio "
    f"in exact milli units — unique*1000 div total, never a float; "
    f"doc_id tiebreaks make the pick total), and the pair survives "
    f"only if the quality margin clears {_PP_MARGIN} milli — near-tie "
    f"pairs are label noise, the margin gate is how post-training "
    f"sets actually filter (fixture probe: in-bucket TTR spread "
    f"292-709, so real pairs survive while 1-doc and flat buckets "
    f"drop). The post-training sibling of pipeline_pair_dataset "
    f"(contrastive pairs) and pipeline_dedup_keep_best (best-only "
    f"keep): preference learning needs the WORST doc too. One "
    f"zero-shuffle scoring pass; windows are bucket-local; output is "
    f"bucket-count-sized",
)
def pipeline_preference_pairs(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        "lang",
        "source",
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000"
            " div size(split(text, ' '))"
        ).alias("score"),
    )
    wb = W.partitionBy("lang", "source").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    ww = W.partitionBy("lang", "source").orderBy(
        F.col("score").asc(), F.col("doc_id")
    )
    wc = W.partitionBy("lang", "source")
    r = s.select(
        "lang",
        "source",
        "doc_id",
        "score",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n_docs"),
    )
    best = r.where(F.col("rb") == 1).select(
        "lang",
        "source",
        "n_docs",
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("chosen_score"),
    )
    worst = r.where(F.col("rw") == 1).select(
        "lang",
        "source",
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
    )
    return (
        best.join(worst, ["lang", "source"])
        .where(
            (F.col("chosen_doc") != F.col("rejected_doc"))
            & (
                F.col("chosen_score") - F.col("rejected_score")
                >= _PP_MARGIN
            )
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "chosen_doc",
            "rejected_doc",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias(
                "margin_milli"
            ),
        )
        .orderBy("lang", "source")
    )
