"""Relevance scoring over the document corpus (SURVEY §2.9).

TF-IDF and BM25 — the scoring half of a retrieval/curation stack (the
similarity family covers the vector half). Both are pure aggregate
compositions: one token count keyed by (doc, token), one document-
frequency count keyed by token, and a broadcast of the tiny per-term
IDF table back onto the postings. No Python in the row path; the only
shuffles are the two keyed counts.

Float discipline: ln() is libm-dependent across engines, so every
logarithm-bearing output is ROUNDed (6 dp) on both sides — the same
rule the fn_math/agg_stats families use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from ..registry import register

_TOKS_SQL = "list_filter(regexp_split_to_array(text, '[^a-z0-9]+'), x -> x <> '')"

# Query terms for the BM25 demo — fixed so both engines score the same
# retrieval request.
_QUERY_TERMS = ("data", "join", "filter")


@register(
    "text_tfidf",
    section="2.9",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    tf AS (SELECT doc_id, unnest(toks) AS token FROM t),
    tfc AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tf GROUP BY doc_id, token),
    df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM tfc GROUP BY token)
    SELECT tfc.doc_id, tfc.token, tfc.tf,
           ROUND(tfc.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tfc JOIN df USING (token), n
    WHERE tfc.tf >= 3
    """,
    notes="TF-IDF postings: per-(doc, token) term frequency x "
    "ln(N/df) inverse document frequency; tf >= 3 keeps the output "
    "bounded. Two map-side-combined counts + a broadcast of the tiny "
    "IDF table; ln ROUNDed 6 dp (libm variance)",
)
def text_tfidf(spark, sf_dir):
    """The classic sparse-retrieval weight, as two combinable counts:
    term frequency keyed by (doc, token) and document frequency keyed
    by token. The IDF side is vocabulary-sized (tiny at any corpus
    scale), so it broadcasts; the postings side never reshuffles after
    its first keyed count."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    n_docs = d.count()
    tfc = (
        d.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tfc.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    idf = F.log(F.lit(float(n_docs)) / F.col("df"))
    return (
        tfc.join(F.broadcast(df), "token")
        .where(F.col("tf") >= 3)
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


@register(
    "text_bm25",
    section="2.9",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
    tf AS (SELECT doc_id, unnest(toks) AS token FROM t),
    tfc AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tf GROUP BY doc_id, token
            HAVING token IN ('data', 'join', 'filter')),
    df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM tfc GROUP BY token),
    scored AS (
      SELECT tfc.doc_id,
             ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) *
             (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
               AS s
      FROM tfc JOIN df USING (token)
               JOIN dl ON tfc.doc_id = dl.doc_id, stats)
    SELECT doc_id, ROUND(SUM(s), 6) AS bm25
    FROM scored GROUP BY doc_id
    """,
    notes="BM25 (k1=1.2, b=0.75) for a fixed 3-term query: postings "
    "restricted to the query terms FIRST (the inverted-index access "
    "pattern — scoring never touches non-query tokens), then the "
    "Robertson-Sparck-Jones idf and length-normalized tf; ROUND 6 dp "
    "(ln + float-division chain)",
)
def text_bm25(spark, sf_dir):
    """Search-engine scoring as the inverted index would execute it:
    filter the postings to the query's terms before any join (at scale
    this is the difference between touching three posting lists and
    touching the corpus), then score with document-length
    normalization. doc lengths and the df table are both small-keyed;
    the per-doc sum is the only output-sized shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    k1, b = 1.2, 0.75
    dl = d.select("doc_id", F.size(toks).cast("long").alias("dl"))
    row = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = row["n_docs"], row["avgdl"]
    tfc = (
        d.select("doc_id", F.explode(toks).alias("token"))
        .where(F.col("token").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tfc.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    idf = F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    return (
        tfc.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .select("doc_id", (idf * tf_norm).alias("s"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("bm25"))
    )


@register(
    "text_collocations",
    section="2.9",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    big AS (
      SELECT UNNEST(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t WHERE len(toks) >= 2),
    uni AS (SELECT UNNEST(toks) AS token FROM t),
    cb AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cab
           FROM big GROUP BY bigram),
    cu AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c
           FROM uni GROUP BY token),
    tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM uni) AS n_uni,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM big) AS n_big)
    SELECT cb.bigram, cb.cab,
           FLOOR(ln(CAST(cb.cab AS DOUBLE) * t.n_uni * t.n_uni
                    / t.n_big / ca.c / cb2.c) * 1000000) / 1000000.0 AS pmi
    FROM cb
    JOIN cu ca ON ca.token = split_part(cb.bigram, ' ', 1)
    JOIN cu cb2 ON cb2.token = split_part(cb.bigram, ' ', 2)
    CROSS JOIN tot t
    WHERE cb.cab >= 5
    """,
    notes="PMI-scored collocations: bigram counts vs unigram counts, "
    "pmi = ln(c(ab) * N^2 / (N_b * c(a) * c(b))) over EXACT integer "
    "counts (the only float op is one ln, floor-disciplined). Bigrams "
    "via the adjacent-pair transform; cab >= 5 bounds the output; the "
    "unigram side broadcasts (vocabulary-sized)",
)
def text_collocations(spark, sf_dir):
    """Which word pairs co-occur more than chance — the tokenizer-
    merge / phrase-mining primitive. Two map-side-combined counts
    (bigrams, unigrams) and two broadcast joins of the vocabulary-
    sized unigram table back onto the bigram counts; the data-sized
    shuffle is the bigram count alone."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    t = d.select(toks.alias("toks"))
    bigrams = t.where(F.size("toks") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                ),
            )
        ).alias("bigram")
    )
    uni = t.select(F.explode("toks").alias("token"))
    # Checkpoint both count tables: each feeds 2-3 consumers (broadcast
    # subtrees defeat exchange reuse — STATE.md), so without the barrier
    # the scan+explode pipeline would run ~6x. Totals derive from the
    # tiny aggregates themselves (sum of counts), never a second corpus
    # pass. cb is bigram-vocabulary-sized, cu unigram-sized — both far
    # smaller than the corpus at any scale.
    cb = (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cab"))
        .localCheckpoint()
    )
    cu = (
        uni.groupBy("token").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    )
    tot = cu.agg(F.sum("c").cast("long").alias("n_uni")).crossJoin(
        cb.agg(F.sum("cab").cast("long").alias("n_big"))
    )
    ca = cu.select(F.col("token").alias("tok_a"), F.col("c").alias("c_a"))
    cb2 = cu.select(F.col("token").alias("tok_b"), F.col("c").alias("c_b"))
    pmi = (
        F.floor(
            F.log(
                F.col("cab").cast("double")
                * F.col("n_uni")
                * F.col("n_uni")
                / F.col("n_big")
                / F.col("c_a")
                / F.col("c_b")
            )
            * 1000000
        )
        / 1000000.0
    )
    return (
        cb.where(F.col("cab") >= 5)
        .join(F.broadcast(ca), F.split("bigram", " ")[0] == F.col("tok_a"))
        .join(F.broadcast(cb2), F.split("bigram", " ")[1] == F.col("tok_b"))
        .crossJoin(F.broadcast(tot))
        .select("bigram", "cab", pmi.alias("pmi"))
    )


@register(
    "text_keyphrase",
    section="2.9",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    tfc AS (SELECT doc_id, unnest(toks) AS token FROM t),
    tfg AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tfc GROUP BY doc_id, token),
    dfc AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM tfg GROUP BY token),
    ranked AS (
      SELECT tfg.doc_id, tfg.token, tfg.tf, dfc.df,
             ROUND(tfg.tf * ln(CAST(n_docs AS DOUBLE) / dfc.df), 6) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY tfg.doc_id
                                ORDER BY tfg.tf DESC, dfc.df ASC,
                                         tfg.token) AS rk
      FROM tfg JOIN dfc USING (token), n)
    SELECT doc_id, token, tf, df, tfidf, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    """,
    notes="keyword extraction: top-3 terms per document. The rank key is "
    "all-integer (tf desc, df asc, token) so cross-engine ordering is "
    "exact even though the reported tfidf weight carries a libm ln "
    "(ROUND 6 dp). Reuses the tf/df counting shape of text_tfidf; the "
    "per-doc window partitions on doc_id — no global ordering anywhere",
)
def text_keyphrase(spark, sf_dir):
    """Per-document keywords: frequent in the doc, rare in the corpus.
    Ranking by (tf desc, df asc, token) keeps the window key integer-
    deterministic; the float TF-IDF is carried as a reported weight
    only. Vocabulary-sized df table broadcasts; the postings table
    shuffles once on doc_id for the top-k window."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    n_docs = d.count()
    tfg = (
        d.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfc = tfg.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    return (
        tfg.join(F.broadcast(dfc), "token")
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("tf"), F.asc("df"), F.asc("token")
                )
            )
            .cast("long")
            .alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@register(
    "text_zipf_fit",
    section="2.9",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT UNNEST(toks) AS token FROM t)
            GROUP BY token HAVING COUNT(*) >= 5),
    rk AS (SELECT token, c,
                  ROW_NUMBER() OVER (ORDER BY c DESC, token) AS r
           FROM cnt),
    pt AS (SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
                  CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS y
           FROM rk),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM pt)
    SELECT n AS n_vocab,
           FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * 1000000) / 1000000.0 AS zipf_slope
    FROM s
    """,
    notes="Zipf-law fit of the corpus: OLS slope of ln(count) vs "
    "ln(rank) over tokens with count >= 5. Each ln is integerized to a "
    "1e-6 grid BEFORE the sums (the emb_centroid trick), so the OLS "
    "moments are exact integers and accumulation order is irrelevant; "
    "the one float division at the end is floor-disciplined. Rank is "
    "a window over the vocabulary-sized count table (metadata-scale "
    "next to the corpus; band it like sort_skyline if vocab ever isn't)",
)
def text_zipf_fit(spark, sf_dir):
    """Does the corpus look like natural language? Healthy text has
    zipf_slope near -1; scraped boilerplate and synthetic spam deviate
    — a cheap corpus-level quality gate. The token count is the only
    data-sized pass; everything after runs on the vocabulary."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    cnt = (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") >= 5)
    )
    rk = cnt.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), "token"))
    )
    pt = rk.select(
        F.round(F.log(F.col("r").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("c").cast("double")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    s = pt.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_vocab"),
        (
            F.floor(
                (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
                / (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                * 1000000
            )
            / 1000000.0
        ).alias("zipf_slope"),
    )


_RRF_K = 60        # the standard RRF dampening constant
_RRF_DEPTH = 100   # per-ranker shortlist depth
_RRF_OUT = 20      # fused results returned
_RRF_TERM = "join"


@register(
    "sim_rrf_fusion",
    section="2.9",
    oracle=f"""
    WITH u AS (
      SELECT d.doc_id, {_TOKS_SQL} AS toks,
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
    fp AS (
      SELECT doc_id,
             CAST(len(list_filter(toks, x -> x = '{_RRF_TERM}')) AS BIGINT)
               AS tf,
             CAST(list_sum(
               [CAST(ROUND(v[i + 1] * 1e6) AS BIGINT)
                * CAST(ROUND(qv[i + 1] * 1e6) AS BIGINT)
                for i in range(64)]) AS BIGINT) AS dot_fp
      FROM u, q),
    lex AS (SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id)
                        AS BIGINT) AS lex_rank
            FROM fp QUALIFY lex_rank <= {_RRF_DEPTH}),
    sem AS (SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY dot_fp DESC, doc_id)
                        AS BIGINT) AS sem_rank
            FROM fp QUALIFY sem_rank <= {_RRF_DEPTH}),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.lex_rank, sem.sem_rank,
             COALESCE(1.0 / ({_RRF_K} + lex.lex_rank), 0.0)
             + COALESCE(1.0 / ({_RRF_K} + sem.sem_rank), 0.0) AS score
      FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS fused_rank,
           doc_id, lex_rank, sem_rank,
           CAST(FLOOR(score * 1e9) AS BIGINT) AS rrf_ppb
    FROM fused
    QUALIFY fused_rank <= {_RRF_OUT}
    """,
    notes=f"hybrid-retrieval fusion: a lexical ranker (term frequency of "
    f"'{_RRF_TERM}', integer) and a semantic ranker (query-vector dot "
    "product on an exact 1e-6 fixed-point grid — BIGINT products, no "
    "float-sum order anywhere) each produce a top-100 shortlist, then "
    f"reciprocal-rank fusion sum(1/({_RRF_K}+rank)) merges them and the "
    "top-20 fused results emit. Scores are two-term sums of exact-rank "
    "rationals, so the doubles are bit-identical across engines; ties "
    "break on doc_id. The per-ranker global top-N is the "
    "TakeOrderedAndProject shape (map-side partial top-k, never a "
    "global sort), and the fusion join touches only 2x100 rows",
)
def sim_rrf_fusion(spark, sf_dir):
    """The standard two-tower retrieval merge: each ranker computes its
    shortlist independently (bounded top-N per ranker — at corpus scale
    each is a TakeOrdered, not a global sort), then RRF fuses on rank
    alone, which is why it needs no score calibration between BM25-like
    and cosine-like scales. All rank arithmetic is integer; the only
    floats are the final 1/(k+rank) rationals, computed identically on
    both engines."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(
        F.expr(
            "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6)"
            " AS BIGINT))"
        ).alias("qfp")
    )
    u = (
        d.join(e, d.doc_id == e.vec_id)
        .join(F.broadcast(qv))
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.split("text", "[^a-z0-9]+"), lambda x: x == _RRF_TERM
                )
            )
            .cast("long")
            .alias("tf"),
            F.expr(
                "aggregate(zip_with(transform(embedding, x ->"
                " CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT)), qfp,"
                " (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("dot_fp"),
        )
    )
    # bounded top-N per ranker: orderBy+limit plans as
    # TakeOrderedAndProject (partial top-k per partition, merged on one
    # reducer over <= N*partitions rows) — the scale-safe global-rank
    # escape hatch for shortlist-sized N
    lex = u.orderBy(F.col("tf").desc(), "doc_id").limit(_RRF_DEPTH).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("tf").desc(), "doc_id"))
        .cast("long")
        .alias("lex_rank"),
    )
    sem = u.orderBy(F.col("dot_fp").desc(), "doc_id").limit(_RRF_DEPTH).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("dot_fp").desc(), "doc_id"))
        .cast("long")
        .alias("sem_rank"),
    )
    fused = (
        lex.withColumnRenamed("doc_id", "ldoc")
        .join(
            sem.withColumnRenamed("doc_id", "sdoc"),
            F.col("ldoc") == F.col("sdoc"),
            "full",
        )
        .select(
            F.coalesce("ldoc", "sdoc").alias("doc_id"),
            "lex_rank",
            "sem_rank",
            (
                F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("sem_rank")), F.lit(0.0))
            ).alias("score"),
        )
    )
    wf = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        fused.select(
            F.row_number().over(wf).cast("long").alias("fused_rank"),
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.floor(F.col("score") * 1e9).cast("long").alias("rrf_ppb"),
        )
        .where(F.col("fused_rank") <= _RRF_OUT)
    )
