"""Round-10 pack 3 (SURVEY §2.4/§2.8/§2.9/§2.13 extensions): the
Hodges-Lehmann estimator (median of Walsh averages — the robust
location member that pairs with agg_wilcoxon_signed_rank the way the
mean pairs with the t-test), Chao1 species-richness estimation with
Good-Turing coverage (how much vocabulary the corpus has NOT seen yet
— the unseen-mass companion to text_heaps_law's growth curve and
text_hapax_ratio's seen-once share), a Johnson-Lindenstrauss random
projection (signed +-1 sketch, 64 -> 8 dims — the dimensionality-
reduction scale path for embedding workloads), and ROUGE-1 scoring of
the DPO preference pairs (unigram-overlap precision/recall/F1 between
chosen and rejected — the eval-metric reading on top of
pipeline_preference_pairs' construction).

Cross-engine float discipline (FIXTURES.md):
- Hodges-Lehmann carries DOUBLED Walsh sums (x_i + x_j, exact BIGINT),
  picks the exact middle order statistic by row_number (the count
  n(n+1)/2 is odd for n = 30, so the median is a single element — no
  averaging rule to disagree on), and divides by 2 once at the end.
- Chao1's bias-corrected form V + f1(f1-1)/(2(f2+1)) is one float
  division of exact BIGINTs (defined even when f2 = 0, unlike the
  classic form); Good-Turing coverage 1 - f1/N likewise.
- The JL sign matrix (k x d = 8 x 64 entries, a Knuth-hash parity per
  cell) is PYTHON-computed and embedded as literal arrays in BOTH
  engines (the rank_ndcg discount-table trick), and every projection
  folds the embedding in ascending index order with a prepended 0.0
  seed, so the float sequences are bit-identical cross-engine.
- ROUGE-1 is all-integer: multiset overlap = sum of per-token minimum
  counts, precision/recall/F1 exact integer ppm divisions (F1 via the
  harmonic identity 2*ov/(n_c + n_r), never a float ratio of ratios).

Scale notes (100 TB): Hodges-Lehmann runs on the pinned 30-day grid
(465 Walsh pairs per type at ANY corpus size); Chao1 is trigram-
explode map work + two vocabulary-keyed aggregations (the
text_heaps_law cost shape); the JL projection is per-row map work
against a literal matrix — no shuffle, no fit, no collect — and is
the documented first stage for emb_* workloads when d grows; ROUGE
joins the bucket-count-sized pair table back to two documents per
pair, so the explode fan-out is pairs x doc-length, corpus-
independent after the scoring pass.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.pipeline7 import _PP_MARGIN, pipeline_preference_pairs
from ..io import table
from ..registry import register
from .stats11 import _DAY_GRID_SQL, _day_grid

# JL: project d=64 float dims onto k=8 signed-sum sketch dims; signs
# are a fixed pseudorandom matrix derived from a Knuth multiplicative
# hash of the (out_dim, in_dim) cell — python-computed, literal on
# both engines. The query's workload is pinned to vec_id < _JL_IDS
# (the fixture-degeneracy rule: id-bound retrieval sets so the output
# is corpus-size-independent).
_JL_D = 64
_JL_K = 8
_JL_IDS = 500
_JL_SIGNS = [
    [
        1
        if ((d * _JL_D + j + 1) * 2654435761) % (1 << 32) >= (1 << 31)
        else -1
        for j in range(_JL_D)
    ]
    for d in range(_JL_K)
]


def _jl_row_sql(d: int) -> str:
    return "[" + ", ".join(str(s) for s in _JL_SIGNS[d]) + "]"


def _jl_row_spark(d: int) -> str:
    return "array(" + ", ".join(str(s) for s in _JL_SIGNS[d]) + ")"


# shared oracle fragment: the DPO pair construction (identical to
# pipeline_preference_pairs' oracle — the margin constant is imported
# so the two queries can never drift)
_PAIRS_SQL = f"""
    s AS (
      SELECT doc_id, lang, source,
             CAST(len(list_distinct(string_split(text, ' '))) * 1000
                  // len(string_split(text, ' ')) AS BIGINT) AS score
      FROM documents),
    r AS (
      SELECT lang, source, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY score DESC, doc_id) AS rb,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY score ASC, doc_id) AS rw
      FROM s),
    best AS (SELECT lang, source, doc_id AS chosen_doc,
                    score AS chosen_score
             FROM r WHERE rb = 1),
    worst AS (SELECT lang, source, doc_id AS rejected_doc,
                     score AS rejected_score
              FROM r WHERE rw = 1),
    pairs AS (
      SELECT b.lang, b.source, b.chosen_doc, w.rejected_doc
      FROM best b JOIN worst w USING (lang, source)
      WHERE b.chosen_doc <> w.rejected_doc
        AND b.chosen_score - w.rejected_score >= {_PP_MARGIN})
"""


@register(
    "agg_hodges_lehmann",
    section="2.4",
    # day grid imported from stats11, not re-inlined: if the analysis
    # window ever moves, the Spark side (_day_grid) and this oracle
    # move TOGETHER (the _PP_MARGIN no-drift discipline)
    oracle=f"""
    WITH {_DAY_GRID_SQL},
    w AS (
      SELECT a.event_type, a.c + b.c AS w2
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.day <= b.day),
    o AS (
      SELECT event_type, w2,
             CAST(ROW_NUMBER() OVER
                  (PARTITION BY event_type ORDER BY w2) AS BIGINT)
               AS rk,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS nw
      FROM w),
    m AS (
      SELECT d.event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s
      FROM d GROUP BY 1)
    SELECT o.event_type, m.n AS n_days, o.nw AS n_walsh,
           CAST(o.w2 AS DOUBLE) / 2 AS hl,
           FLOOR(CAST(m.s AS DOUBLE) / m.n * 1e6) / 1e6 AS mean_daily
    FROM o JOIN m ON m.event_type = o.event_type
    WHERE o.rk = (o.nw + 1) // 2
    ORDER BY o.event_type
    """,
    notes="Hodges-Lehmann location estimator per event type: the median "
    "of all Walsh averages (x_i + x_j)/2 over day pairs i <= j of the "
    "pinned 30-day count series — the estimator the Wilcoxon "
    "signed-rank test inverts, ~95% as efficient as the mean under "
    "normality but with breakdown point 0.29 instead of 0. Doubled "
    "Walsh sums stay exact BIGINTs; n(n+1)/2 = 465 is odd, so the "
    "median is a single order statistic picked by row_number (no "
    "even-count averaging rule to disagree on), halved once at the "
    "end; the plain mean rides along for the robustness contrast. "
    "One daily rollup; the pair join is 465 rows per type at ANY "
    "corpus scale",
)
def agg_hodges_lehmann(spark, sf_dir):
    d = _day_grid(spark, sf_dir)
    a = d.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("da"),
        F.col("c").alias("ca"),
    )
    b = d.select(
        F.col("event_type").alias("etb"),
        F.col("day").alias("db"),
        F.col("c").alias("cb"),
    )
    w = (
        a.join(b, (F.col("et") == F.col("etb")) & (F.col("da") <= F.col("db")))
        .select(F.col("et").alias("event_type"), (F.col("ca") + F.col("cb")).alias("w2"))
    )
    wo = W.partitionBy("event_type").orderBy("w2")
    wall = W.partitionBy("event_type")
    o = w.select(
        "event_type",
        "w2",
        F.row_number().over(wo).cast("long").alias("rk"),
        F.count(F.lit(1)).over(wall).cast("long").alias("nw"),
    )
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    return (
        # integer div, matching the oracle's (nw+1)//2: PySpark `/` is
        # DOUBLE division, so the float form silently matches NO row
        # whenever nw is even (the ts_theil_sen gotcha, round 5)
        o.where(F.col("rk") == F.expr("(nw + 1) div 2"))
        .join(F.broadcast(m), "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("nw").alias("n_walsh"),
            (F.col("w2").cast("double") / 2).alias("hl"),
            (
                F.floor(F.col("s").cast("double") / F.col("n") * 1e6)
                / 1e6
            ).alias("mean_daily"),
        )
        .orderBy("event_type")
    )


@register(
    "text_chao1",
    section="2.9",
    oracle="""
    WITH t AS (
      SELECT lang, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 3),
    tg AS (
      SELECT lang,
             UNNEST(list_transform(
               generate_series(1, CAST(len(toks) AS BIGINT) - 2),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
               AS g
      FROM t),
    c AS (SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c
          FROM tg GROUP BY 1, 2),
    ff AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS v_obs,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS f1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS f2
      FROM c GROUP BY 1)
    SELECT lang, v_obs, f1, f2,
           FLOOR((v_obs + CAST(f1 * (f1 - 1) AS DOUBLE)
                  / (2 * (f2 + 1))) * 1e3) / 1e3 AS chao1,
           FLOOR((1 - CAST(f1 AS DOUBLE) / n_tokens) * 1e6) / 1e6
             AS coverage
    FROM ff ORDER BY lang
    """,
    notes="Chao1 species-richness estimate of each language's TRIGRAM "
    "vocabulary (bias-corrected form V + f1(f1-1)/(2(f2+1)), defined "
    "even when f2 = 0) plus Good-Turing coverage 1 - f1/N: how much "
    "phrasing the corpus has NOT seen yet, from the singleton/doubleton "
    "counts alone — the unseen-mass companion to text_heaps_law's "
    "growth exponent and text_hapax_ratio's seen-once share. Trigrams, "
    "not words: the synthetic word vocabulary saturates in the first "
    "decile (FIXTURES.md), which would pin f1 ~ 0 and chao1 ~ V. "
    "Fixture ratios chao1/V run 2.8-7.9 across languages — real, "
    "language-specific unseen mass. Exact BIGINT frequency-of-"
    "frequency counts, two float ops at the end. Trigram explode is "
    "corpus-linear map work; both aggregations key on vocabulary-"
    "shaped (lang, trigram) with map-side combine",
)
def text_chao1(spark, sf_dir):
    t = (
        table(spark, sf_dir, "documents")
        .select("lang", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 3)
    )
    tg = t.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat(element_at(toks, i), ' ',"
                " element_at(toks, i + 1), ' ',"
                " element_at(toks, i + 2)))"
            )
        ).alias("g"),
    )
    c = tg.groupBy("lang", "g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ff = c.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("v_obs"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("f2"),
    )
    chao1 = (
        F.col("v_obs")
        + (F.col("f1") * (F.col("f1") - 1)).cast("double")
        / (2 * (F.col("f2") + 1))
    )
    coverage = 1 - F.col("f1").cast("double") / F.col("n_tokens")
    return ff.select(
        "lang",
        "v_obs",
        "f1",
        "f2",
        (F.floor(chao1 * 1e3) / 1e3).alias("chao1"),
        (F.floor(coverage * 1e6) / 1e6).alias("coverage"),
    ).orderBy("lang")


@register(
    "emb_jl_projection",
    section="2.8",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding
      FROM embeddings WHERE vec_id < {_JL_IDS}),
    p AS (
      SELECT vec_id, label,
             {", ".join(
               f'''list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(range(1, {_JL_D + 1}),
                     j -> ({_jl_row_sql(d)})[j]
                          * CAST(embedding[j] AS DOUBLE))),
                 (a, b) -> a + b) AS p{d}'''
               for d in range(_JL_K)
             )},
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, {_JL_D + 1}),
                   j -> CAST(embedding[j] AS DOUBLE)
                        * CAST(embedding[j] AS DOUBLE))),
               (a, b) -> a + b) AS nx2
      FROM e)
    SELECT vec_id, label,
           FLOOR(p0 * 1e6) / 1e6 AS proj0,
           FLOOR(p1 * 1e6) / 1e6 AS proj1,
           FLOOR(p2 * 1e6) / 1e6 AS proj2,
           FLOOR(({" + ".join(f"p{d} * p{d}" for d in range(_JL_K))})
                 / ({_JL_K} * nx2) * 1e6) / 1e6 AS norm_ratio
    FROM p ORDER BY vec_id
    """,
    notes=f"Johnson-Lindenstrauss random projection of the {_JL_D}-dim "
    f"embeddings onto a {_JL_K}-dim signed-sum sketch: the +-1 sign "
    f"matrix is a fixed Knuth-hash parity per (out, in) cell, "
    f"python-computed and embedded as literal arrays in BOTH engines "
    f"(no runtime randomness, no cross-engine hash), and each "
    f"projection folds the embedding in ascending index order from a "
    f"0.0 seed so the float sequences are bit-identical. norm_ratio "
    f"= ||p||^2/(k*||x||^2) reads the JL distortion per vector "
    f"(E[ratio] = 1; the reference test asserts the fixture's mean "
    f"lands near 1 with >65% of vectors inside [0.3, 2.0] — the "
    f"synthetic embeddings are heavier-tailed than the Gaussian "
    f"chi2_k/k, probed at all three SFs before the bound was set). "
    f"Workload pinned to vec_id < "
    f"{_JL_IDS} (id-bounded retrieval set, corpus-size-independent "
    f"output). THE scale path for emb_* workloads when d grows: "
    f"per-row map work against a literal matrix — no shuffle, no "
    f"fit, no collect, and downstream ANN/dedup run at k/d the cost",
)
def emb_jl_projection(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < _JL_IDS
    )

    def proj(d):
        return F.expr(
            f"aggregate(sequence(1, {_JL_D}), CAST(0.0 AS DOUBLE),"
            f" (acc, j) -> acc + element_at({_jl_row_spark(d)}, j)"
            f" * CAST(element_at(embedding, j) AS DOUBLE))"
        )

    nx2 = F.expr(
        f"aggregate(sequence(1, {_JL_D}), CAST(0.0 AS DOUBLE),"
        f" (acc, j) -> acc + CAST(element_at(embedding, j) AS DOUBLE)"
        f" * CAST(element_at(embedding, j) AS DOUBLE))"
    )
    p = e.select(
        "vec_id",
        "label",
        *[proj(d).alias(f"p{d}") for d in range(_JL_K)],
        nx2.alias("nx2"),
    )
    np2 = sum(
        (F.col(f"p{d}") * F.col(f"p{d}") for d in range(_JL_K)),
        F.lit(0.0),
    )
    return p.select(
        "vec_id",
        "label",
        (F.floor(F.col("p0") * 1e6) / 1e6).alias("proj0"),
        (F.floor(F.col("p1") * 1e6) / 1e6).alias("proj1"),
        (F.floor(F.col("p2") * 1e6) / 1e6).alias("proj2"),
        (
            F.floor(np2 / (_JL_K * F.col("nx2")) * 1e6) / 1e6
        ).alias("norm_ratio"),
    ).orderBy("vec_id")


@register(
    "pipeline_pair_rouge",
    section="2.13",
    oracle=f"""
    WITH {_PAIRS_SQL},
    ct AS (
      SELECT p.lang, p.source, p.chosen_doc, p.rejected_doc,
             UNNEST(string_split(d.text, ' ')) AS tok, 1 AS side
      FROM pairs p JOIN documents d ON d.doc_id = p.chosen_doc
      UNION ALL
      SELECT p.lang, p.source, p.chosen_doc, p.rejected_doc,
             UNNEST(string_split(d.text, ' ')), 2
      FROM pairs p JOIN documents d ON d.doc_id = p.rejected_doc),
    tc AS (
      SELECT lang, source, chosen_doc, rejected_doc, tok,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS cc,
             CAST(SUM(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS cr
      FROM ct GROUP BY 1, 2, 3, 4, 5),
    ov AS (
      SELECT lang, source, chosen_doc, rejected_doc,
             CAST(SUM(LEAST(cc, cr)) AS BIGINT) AS overlap,
             CAST(SUM(cc) AS BIGINT) AS n_cho,
             CAST(SUM(cr) AS BIGINT) AS n_rej
      FROM tc GROUP BY 1, 2, 3, 4)
    SELECT lang, source, chosen_doc, rejected_doc, overlap,
           overlap * 1000000 // n_cho AS p_ppm,
           overlap * 1000000 // n_rej AS r_ppm,
           2 * overlap * 1000000 // (n_cho + n_rej) AS f1_ppm
    FROM ov ORDER BY lang, source
    """,
    notes=f"ROUGE-1 scoring of the DPO preference pairs: unigram "
    f"MULTISET overlap (sum of per-token minimum counts) between each "
    f"bucket's chosen and rejected documents, with precision, recall "
    f"and F1 as exact integer ppm (F1 via the harmonic identity "
    f"2*ov/(n_c + n_r) — never a float ratio of ratios). The "
    f"eval-metric reading on top of pipeline_preference_pairs' "
    f"construction (same pair SQL, same {_PP_MARGIN}-milli margin "
    f"gate, imported constant so the two can never drift): high "
    f"ROUGE between chosen and rejected means the pair teaches "
    f"style, low ROUGE means it teaches content. The pair table is "
    f"bucket-count-sized, so the token explode fans out pairs x "
    f"doc-length rows — corpus-independent after the scoring pass",
)
def pipeline_pair_rouge(spark, sf_dir):
    pairs = pipeline_preference_pairs(spark, sf_dir).select(
        "lang", "source", "chosen_doc", "rejected_doc"
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    cho = pairs.join(
        docs, pairs.chosen_doc == docs.doc_id
    ).select(
        "lang",
        "source",
        "chosen_doc",
        "rejected_doc",
        F.explode(F.split("text", " ")).alias("tok"),
        F.lit(1).alias("side"),
    )
    rej = pairs.join(
        docs, pairs.rejected_doc == docs.doc_id
    ).select(
        "lang",
        "source",
        "chosen_doc",
        "rejected_doc",
        F.explode(F.split("text", " ")).alias("tok"),
        F.lit(2).alias("side"),
    )
    tc = (
        cho.unionByName(rej)
        .groupBy("lang", "source", "chosen_doc", "rejected_doc", "tok")
        .agg(
            F.sum((F.col("side") == 1).cast("long"))
            .cast("long")
            .alias("cc"),
            F.sum((F.col("side") == 2).cast("long"))
            .cast("long")
            .alias("cr"),
        )
    )
    ov = tc.groupBy("lang", "source", "chosen_doc", "rejected_doc").agg(
        F.sum(F.least("cc", "cr")).cast("long").alias("overlap"),
        F.sum("cc").cast("long").alias("n_cho"),
        F.sum("cr").cast("long").alias("n_rej"),
    )
    return ov.select(
        "lang",
        "source",
        "chosen_doc",
        "rejected_doc",
        "overlap",
        F.expr("overlap * 1000000 div n_cho").alias("p_ppm"),
        F.expr("overlap * 1000000 div n_rej").alias("r_ppm"),
        F.expr("2 * overlap * 1000000 div (n_cho + n_rej)").alias(
            "f1_ppm"
        ),
    ).orderBy("lang", "source")


# SES model selection: alpha grid in exact eighths (binary fractions,
# so every smoothing product is engine-identical), folded over the
# pinned 30-day series in day order
_SES_ALPHAS = [(k, k / 8) for k in range(1, 8)]


@register(
    "ts_ses_select",
    section="2.4",
    # day grid imported from stats11 (see agg_hodges_lehmann note)
    oracle=f"""
    WITH {_DAY_GRID_SQL},
    arr AS (
      SELECT event_type,
             list(CAST(c AS DOUBLE) ORDER BY day) AS xs
      FROM d GROUP BY 1),
    fits AS (
      SELECT event_type, xs,
             {", ".join(
               f'''list_reduce(
                 list_prepend([xs[1], CAST(0.0 AS DOUBLE)],
                   [[x, CAST(0.0 AS DOUBLE)] FOR x IN xs[2:]]),
                 (acc, e) -> [acc[1] + {k}.0/8 * (e[1] - acc[1]),
                              acc[2] + (e[1] - acc[1]) * (e[1] - acc[1])])
                 AS f{k}'''
               for k, _a in _SES_ALPHAS
             )}
      FROM arr),
    pick AS (
      SELECT event_type,
             CASE {" ".join(
               f"WHEN f{k}[2] = LEAST("
               + ", ".join(f"f{j}[2]" for j, _ in _SES_ALPHAS)
               + f") THEN {k}"
               for k, _a in _SES_ALPHAS
             )} END AS best_k,
             {", ".join(f"f{k}" for k, _a in _SES_ALPHAS)}
      FROM fits)
    SELECT event_type,
           CAST(best_k AS BIGINT) AS best_alpha_eighths,
           FLOOR(CASE {" ".join(
             f"WHEN best_k = {k} THEN f{k}[2]" for k, _a in _SES_ALPHAS
           )} END * 1e3) / 1e3 AS sse,
           FLOOR(CASE {" ".join(
             f"WHEN best_k = {k} THEN f{k}[1]" for k, _a in _SES_ALPHAS
           )} END * 1e6) / 1e6 AS forecast
    FROM pick ORDER BY event_type
    """,
    notes="Simple-exponential-smoothing MODEL SELECTION per event type: "
    "the alpha grid {1/8 .. 7/8} (exact binary fractions, so every "
    "smoothing product is bit-identical cross-engine) is folded over "
    "the pinned 30-day series in day order, each fold carrying "
    "[level, one-step-ahead SSE]; the winner is the argmin-SSE alpha "
    "(ties break to the SMALLER alpha — the first CASE match — "
    "deterministic on both engines), reported with its SSE and "
    "next-day forecast. Completes the smoothing ladder (ewma -> holt "
    "-> holt_winters -> kalman) with the missing question — WHICH "
    "smoothing constant — answered by backtest, not decree. One "
    "daily rollup; 7 folds x 30 days of group-local work per type at "
    "ANY corpus scale",
)
def ts_ses_select(spark, sf_dir):
    d = _day_grid(spark, sf_dir)
    arr = d.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, c))),"
            " e -> CAST(e.c AS DOUBLE))"
        ).alias("xs")
    )
    ks = [k for k, _a in _SES_ALPHAS]
    fit_cols = [
        F.expr(
            f"aggregate(slice(xs, 2, size(xs) - 1),"
            f" array(element_at(xs, 1), CAST(0.0 AS DOUBLE)),"
            f" (acc, x) -> array("
            f"element_at(acc, 1) + {k}.0/8 * (x - element_at(acc, 1)),"
            f" element_at(acc, 2)"
            f" + (x - element_at(acc, 1)) * (x - element_at(acc, 1))))"
        ).alias(f"f{k}")
        for k in ks
    ]
    fits = arr.select("event_type", *fit_cols)
    least_sse = F.least(*[F.element_at(F.col(f"f{k}"), 2) for k in ks])
    best = None
    # when-chain built in ASCENDING k order, so the first (smallest
    # alpha) match wins ties — mirroring the oracle's ascending CASE
    for k in ks:
        cond = F.element_at(F.col(f"f{k}"), 2) == least_sse
        best = F.when(cond, F.lit(k)) if best is None else best.when(
            cond, F.lit(k)
        )
    pick = fits.select(
        "event_type",
        best.cast("long").alias("best_k"),
        *[F.col(f"f{k}") for k in ks],
    )
    sse = None
    fc = None
    for k in ks:
        c = F.col("best_k") == k
        s_k = F.element_at(F.col(f"f{k}"), 2)
        f_k = F.element_at(F.col(f"f{k}"), 1)
        sse = F.when(c, s_k) if sse is None else sse.when(c, s_k)
        fc = F.when(c, f_k) if fc is None else fc.when(c, f_k)
    return pick.select(
        "event_type",
        F.col("best_k").alias("best_alpha_eighths"),
        (F.floor(sse * 1e3) / 1e3).alias("sse"),
        (F.floor(fc * 1e6) / 1e6).alias("forecast"),
    ).orderBy("event_type")


@register(
    "profile_key_candidates",
    section="2.4",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    u AS (
      SELECT 'o_orderkey' AS col,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
      FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_totalprice',
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_orderdate',
             CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_custkey+o_orderdate',
             CAST(COUNT(DISTINCT (CAST(o_custkey AS VARCHAR) || '|'
                                  || CAST(o_orderdate AS VARCHAR)))
               AS BIGINT)
      FROM orders)
    SELECT u.col, n.n AS n_rows, u.n_distinct,
           u.n_distinct * 1000000 // n.n AS uniqueness_ppm,
           u.n_distinct = n.n AS is_key
    FROM u CROSS JOIN n ORDER BY u.col
    """,
    notes="Candidate-key discovery over the orders table — the data-"
    "profiling primitive schema inference and CDC-merge configuration "
    "both start from: exact distinct count per column (and for the "
    "(custkey, orderdate) composite, the next lattice layer), "
    "uniqueness as integer ppm, and the is_key verdict (distinct == "
    "rows). The fixture's truth: o_orderkey IS a key, the composite "
    "is NOT quite (customers repeat order dates), every scalar "
    "column is far from one. Exact counts, not approx_count_distinct "
    "— a key verdict cannot ride on a sketch. One scan; each "
    "distinct-count is a partial-aggregable rollup; the composite "
    "uses an injective '|' concat (keys are digits, the separator "
    "cannot collide)",
)
def profile_key_candidates(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    n = o.count()  # driver-side scalar: one Long, bounded by design
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_totalprice",
        "o_orderdate",
    ]
    agg = o.agg(
        *[F.countDistinct(c).cast("long").alias(c) for c in cols],
        F.countDistinct(
            F.concat(
                F.col("o_custkey").cast("string"),
                F.lit("|"),
                F.col("o_orderdate").cast("string"),
            )
        )
        .cast("long")
        .alias("o_custkey+o_orderdate"),
    )
    stack = ", ".join(
        f"'{c}', `{c}`" for c in cols + ["o_custkey+o_orderdate"]
    )
    u = agg.select(
        F.expr(f"stack({len(cols) + 1}, {stack}) AS (col, n_distinct)")
    )
    return u.select(
        "col",
        F.lit(n).cast("long").alias("n_rows"),
        "n_distinct",
        F.expr(f"n_distinct * 1000000 div {n}").alias("uniqueness_ppm"),
        (F.col("n_distinct") == n).alias("is_key"),
    ).orderBy("col")
