"""Training-data pipeline pack 4 (SURVEY §2.6/§2.9/§2.10 extensions, round 4).

Three shapes rounding out the curation/analytics surface:

- `evt_assoc_rules`: market-basket association rules (support /
  confidence / lift) over per-user event-type baskets — the classic
  co-occurrence mining shape. Baskets collect once per user; pair
  expansion happens INSIDE the collected array (higher-order transform),
  so the quadratic blowup is bounded by the item-vocabulary size per
  basket, never joined row-against-row; the item-count and total tables
  are broadcast 1-row/vocab-sized sides.
- `sample_weighted`: deterministic weighted sampling without
  replacement (Efraimidis–Spirakis A-Res): priority = ln(u)/w with u a
  content-addressed md5-derived uniform — never rand(), reproducible
  across engines and stable under corpus growth. Top-k by priority is
  a TakeOrderedAndProject (per-partition heaps + driver merge of k),
  no global sort at any scale.
- `pipeline_shard_manifest`: WebDataset-style export manifest — every
  document gets (writer, file_seq, byte_offset) for a W-writer,
  ~TARGET-byte-chunked shard layout. Writers are md5-assigned so the
  layout is content-addressed; offsets are per-writer window cumsums
  (W independent keyed windows — no global order anywhere); all
  arithmetic is exact integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

_MIN_PAIR = 5  # min co-occurrence count for a rule to surface


@register(
    "evt_assoc_rules",
    section="2.10",
    oracle=f"""
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    i AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_i FROM b GROUP BY 1),
    t AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM b),
    p AS (SELECT x.event_type AS a, y.event_type AS c,
                 CAST(COUNT(*) AS BIGINT) AS pair_n
          FROM b x JOIN b y
            ON x.user_id = y.user_id AND x.event_type <> y.event_type
          GROUP BY 1, 2)
    SELECT p.a AS antecedent, p.c AS consequent, p.pair_n,
           FLOOR(CAST(p.pair_n AS DOUBLE) * 1000000.0
                 / CAST(ia.n_i AS DOUBLE)) / 1000000.0 AS conf,
           FLOOR(CAST(p.pair_n * t.n_users AS DOUBLE) * 1000000.0
                 / CAST(ia.n_i * ic.n_i AS DOUBLE)) / 1000000.0 AS lift
    FROM p
    JOIN i ia ON ia.event_type = p.a
    JOIN i ic ON ic.event_type = p.c
    CROSS JOIN t
    WHERE p.pair_n >= {_MIN_PAIR}
    """,
    notes="market-basket association rules over per-user event-type "
    "baskets: support count, confidence P(c|a), lift "
    "P(a,c)/(P(a)P(c)). Baskets are collect_set per user (one keyed "
    "shuffle); ordered pair expansion runs INSIDE the array with a "
    "higher-order transform, so pair blowup is bounded by basket size "
    "(the event-type vocabulary), never a row-level self-join; item "
    "counts and the user total join back as broadcasts. Ratios are "
    "floor-disciplined single divisions of exact integers",
)
def evt_assoc_rules(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    b = ev.select("user_id", "event_type").distinct()
    items = b.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_i"))
    tot = b.agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    baskets = b.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("its")
    )
    pairs = F.flatten(
        F.transform(
            "its",
            lambda x: F.transform(
                F.filter("its", lambda y: y != x),
                lambda y: F.struct(x.alias("a"), y.alias("c")),
            ),
        )
    )
    pc = (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.c").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("pair_n"))
        .where(F.col("pair_n") >= _MIN_PAIR)
    )
    ia = items.select(F.col("event_type").alias("a"), F.col("n_i").alias("a_n"))
    ic = items.select(F.col("event_type").alias("c"), F.col("n_i").alias("c_n"))
    conf = (
        F.floor(F.col("pair_n").cast("double") * 1000000.0 / F.col("a_n").cast("double"))
        / 1000000.0
    )
    lift = (
        F.floor(
            (F.col("pair_n") * F.col("n_users")).cast("double")
            * 1000000.0
            / (F.col("a_n") * F.col("c_n")).cast("double")
        )
        / 1000000.0
    )
    return (
        pc.join(F.broadcast(ia), "a")
        .join(F.broadcast(ic), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("antecedent"),
            F.col("c").alias("consequent"),
            "pair_n",
            conf.alias("conf"),
            lift.alias("lift"),
        )
    )


_K_WSAMP = 64
_TWO_52 = 4503599627370496.0  # 2^52: 13 hex chars of md5 -> exact double


@register(
    "sample_weighted",
    section="2.6",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, n_chars,
             (('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 13))
                ::BIGINT + 1.0) / {_TWO_52} AS u
      FROM documents)
    SELECT doc_id, n_chars
    FROM w
    ORDER BY ln(u) / n_chars DESC, doc_id
    LIMIT {_K_WSAMP}
    """,
    notes="deterministic weighted sampling without replacement "
    "(Efraimidis–Spirakis A-Res, k=64, weight = n_chars): priority "
    "ln(u)/w with u a content-addressed 52-bit md5 uniform — "
    "reproducible across engines/runs and stable under corpus growth, "
    "never rand(). ORDER BY + LIMIT plans as TakeOrderedAndProject "
    "(per-partition k-heaps, driver merges k*partitions rows) — the "
    "same top-k machinery as limit_topk, so no global sort at 100 TB. "
    "Inclusion probabilities are proportional-to-size without "
    "replacement, the standard corpus-subsampling semantics",
)
def sample_weighted(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string")))
    u = (F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + 1.0) / F.lit(_TWO_52)
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        d.select("doc_id", "n_chars", key.alias("k"))
        .orderBy(F.col("k").desc(), F.col("doc_id").asc())
        .limit(_K_WSAMP)
        .select("doc_id", "n_chars")
    )


_N_WRITERS = 16
_SHARD_BYTES = 20_000


@register(
    "pipeline_shard_manifest",
    section="2.9",
    oracle=f"""
    WITH d AS (SELECT doc_id, n_chars,
                      md5('shard:' || CAST(doc_id AS VARCHAR)) AS h
               FROM documents),
    w AS (SELECT doc_id, n_chars, h,
                 ('0x' || substr(h, 1, 2))::BIGINT % {_N_WRITERS} AS writer
          FROM d),
    o AS (SELECT doc_id, writer,
                 COALESCE(SUM(n_chars) OVER (
                   PARTITION BY writer ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS byte_offset
          FROM w)
    SELECT doc_id,
           CAST(writer AS BIGINT) AS writer,
           CAST(byte_offset // {_SHARD_BYTES} AS BIGINT) AS file_seq,
           CAST(byte_offset AS BIGINT) AS byte_offset
    FROM o
    """,
    notes="WebDataset-style export manifest: each document is assigned "
    "a writer (md5 byte mod W — content-addressed, so the layout is "
    "stable across runs), a file sequence number within the writer "
    "(~20 KB target chunks) and its byte offset in the writer's "
    "concatenated stream. Offsets are W independent keyed window "
    "cumsums — the writer count is the parallelism dial and no global "
    "order exists anywhere; at 100 TB you raise W, not the partition "
    "size. All arithmetic is exact integers (engine-identical)",
)
def pipeline_shard_manifest(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    writer = (F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % _N_WRITERS).alias(
        "writer"
    )
    w = Window.partitionBy("writer").orderBy("h", "doc_id")
    off = F.coalesce(
        F.sum("n_chars").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    return (
        d.select("doc_id", "n_chars", h.alias("h"), writer)
        .select("doc_id", "writer", off.alias("byte_offset"))
        .select(
            "doc_id",
            "writer",
            (F.col("byte_offset") / _SHARD_BYTES).cast("long").alias("file_seq"),
            "byte_offset",
        )
    )


@register(
    "pipeline_mixture_temperature",
    section="2.9",
    oracle="""
    WITH per AS (SELECT source,
                        CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                          AS n_tokens
                 FROM documents GROUP BY source),
    w AS (SELECT source, n_tokens,
                 CAST(FLOOR(sqrt(n_tokens) * 1000.0) AS BIGINT) AS ws
          FROM per),
    t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_n,
                 CAST(SUM(ws) AS BIGINT) AS tot_w
          FROM w)
    SELECT source, n_tokens,
           CAST(n_tokens * 1000000 // t.tot_n AS BIGINT) AS raw_ppm,
           CAST(ws * 1000000 // t.tot_w AS BIGINT) AS temp_ppm
    FROM w CROSS JOIN t
    """,
    notes="temperature-flattened mixture weights (alpha=0.5): each "
    "source's sampling weight goes from n_tokens/total to "
    "sqrt(n_tokens)/sum(sqrt) — the standard upweighting of "
    "low-resource sources in a multilingual/multi-domain pretraining "
    "mix. alpha=0.5 is chosen deliberately: sqrt is an EXACT "
    "correctly-rounded IEEE op (pow(x, 0.7) is not), and the sqrt "
    "weights are floored onto a milli-unit integer grid before "
    "normalizing, so the weight total and the ppm shares are exact "
    "integer arithmetic — engine-identical, no float-sum order "
    "dependence. One aggregate + a 1-row broadcast total",
)
def pipeline_mixture_temperature(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias("n_tokens")
    )
    w = per.select(
        "source",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000.0)
        .cast("long")
        .alias("ws"),
    )
    t = w.agg(
        F.sum("n_tokens").cast("long").alias("tot_n"),
        F.sum("ws").cast("long").alias("tot_w"),
    )
    return w.crossJoin(F.broadcast(t)).select(
        "source",
        "n_tokens",
        ((F.col("n_tokens") * 1000000) / F.col("tot_n")).cast("long").alias("raw_ppm"),
        ((F.col("ws") * 1000000) / F.col("tot_w")).cast("long").alias("temp_ppm"),
    )


_PAIR_MIN_CHARS = 120
_NORM_FP = 1_000_000


@register(
    "pipeline_pair_dataset",
    section="2.9",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             list_sum(list_transform(
               list_transform(embedding,
                              x -> CAST(ROUND(CAST(x AS DOUBLE) * {_NORM_FP})
                                        AS BIGINT)),
               v -> v * v)) AS norm_sq_fp
      FROM embeddings),
    p AS (
      SELECT d.doc_id, d.source, d.lang, d.n_chars,
             CAST(e.norm_sq_fp AS BIGINT) AS norm_sq_fp
      FROM documents d JOIN e ON e.vec_id = d.doc_id
      WHERE d.n_chars >= {_PAIR_MIN_CHARS} AND d.lang IN ('en', 'de', 'fr'))
    SELECT doc_id, source, lang, n_chars,
           FLOOR(sqrt(CAST(norm_sq_fp AS DOUBLE)) / {_NORM_FP} * 1e6) / 1e6
             AS emb_norm
    FROM p
    """,
    notes="paired text-embedding training set (the CLIP/contrastive "
    "data shape): join the caption table to the vector table on the "
    "shared id, gate on text length + language and on embedding health "
    "(non-degenerate norm). The norm is computed from 1e-6 fixed-point "
    "components summed as exact BIGINTs inside the array (left-fold on "
    "both engines), so the gate and the reported norm are "
    "engine-identical — no float-accumulation order anywhere. "
    "One equi-join on the id (both sides pre-filtered; at 100 TB both "
    "are bucketed on the id and the join is shuffle-free)",
)
def pipeline_pair_dataset(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    v = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * _NORM_FP).cast("long"),
    )
    norm_sq = F.aggregate(
        F.transform(v, lambda y: y * y),
        F.lit(0).cast("long"),
        lambda acc, y: acc + y,
    )
    e = emb.select("vec_id", norm_sq.alias("norm_sq_fp"))
    gated = (
        d.where(
            (F.col("n_chars") >= _PAIR_MIN_CHARS)
            & F.col("lang").isin("en", "de", "fr")
        )
        .join(e, d.doc_id == e.vec_id)
    )
    emb_norm = (
        F.floor(
            F.sqrt(F.col("norm_sq_fp").cast("double")) / _NORM_FP * 1e6
        )
        / 1e6
    )
    return gated.select(
        "doc_id", "source", "lang", "n_chars", emb_norm.alias("emb_norm")
    )


_SEG = 20  # fixed segmentation (fixture text has no sentence structure)


@register(
    "text_dedup_paragraph",
    section="2.9",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n,
                 unnest(range(0, greatest(len(toks), 1), {_SEG})) AS start
          FROM t),
    c AS (SELECT doc_id,
                 CAST(start // {_SEG} AS BIGINT) AS seg_idx,
                 array_to_string(toks[start + 1 : least(start + {_SEG}, n)],
                                 ' ') AS seg
          FROM s WHERE start < n),
    r AS (SELECT doc_id, seg_idx, seg,
                 ROW_NUMBER() OVER (PARTITION BY md5(seg)
                                    ORDER BY doc_id, seg_idx) AS rn
          FROM c)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(COUNT(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
           md5(COALESCE(array_to_string(list(seg ORDER BY seg_idx)
                                        FILTER (rn = 1), ' '), '')) AS new_fp
    FROM r GROUP BY doc_id
    """,
    notes="paragraph-level exact dedup (the Dolma/CCNet pass BETWEEN "
    "document dedup and near-dup): every 20-token segment is kept only "
    "at its FIRST corpus occurrence (min doc_id, then position), and "
    "each document is reassembled from its surviving segments in "
    "order. Two keyed shuffles — one on the segment hash (global "
    "first-occurrence rank), one on doc_id (reassembly) — both "
    "corpus-linear; the segment text rides the shuffle but at 100 TB "
    "you'd carry the hash + (doc_id, seg_idx) and rejoin the text, "
    "same plan shape. Reassembly order is restored by sorting the "
    "collected (seg_idx, seg) structs — collect_list order is never "
    "trusted",
)
def text_dedup_paragraph(spark, sf_dir):
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = d.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("n"))
    s = t.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(_SEG))
        ).alias("start"),
    ).where(F.col("start") < F.col("n"))
    c = s.select(
        "doc_id",
        F.expr(f"start DIV {_SEG}").alias("seg_idx"),
        F.array_join(F.slice(F.col("toks"), F.col("start") + 1, F.lit(_SEG)), " ")
        .alias("seg"),
    )
    w = W.partitionBy(F.md5(F.col("seg"))).orderBy("doc_id", "seg_idx")
    r = c.withColumn("rn", F.row_number().over(w))
    kept = F.when(F.col("rn") == 1, F.struct("seg_idx", "seg"))
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segs"),
        F.count_if(F.col("rn") == 1).cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda x: x["seg"]
                ),
                " ",
            )
        ).alias("new_fp"),
    )


_HOLDOUT = 100  # eval-set size (largest-remainder allocated across sources)


@register(
    "pipeline_eval_holdout",
    section="2.9",
    oracle=f"""
    WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                 FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM per),
    q AS (SELECT source, n,
                 CAST({_HOLDOUT} * n // tot.total AS BIGINT) AS quota,
                 CAST(({_HOLDOUT} * n) % tot.total AS BIGINT) AS rem
          FROM per CROSS JOIN tot),
    l AS (SELECT CAST({_HOLDOUT} - SUM(quota) AS BIGINT) AS leftover FROM q),
    a AS (SELECT source, quota, rem,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS pri
          FROM q),
    alloc AS (SELECT a.source,
                     a.quota + CASE WHEN a.pri <= l.leftover THEN 1 ELSE 0 END
                       AS k
              FROM a CROSS JOIN l),
    rk AS (SELECT doc_id, source,
                  ROW_NUMBER() OVER (
                    PARTITION BY source
                    ORDER BY md5('hold:' || CAST(doc_id AS VARCHAR)), doc_id)
                    AS rn
           FROM documents)
    SELECT rk.doc_id, rk.source, CAST(rk.rn AS BIGINT) AS rank_in_source
    FROM rk JOIN alloc ON alloc.source = rk.source
    WHERE rk.rn <= alloc.k
    """,
    notes=f"evaluation holdout with EXACT size {_HOLDOUT}: per-source "
    "quotas by the largest-remainder method (floor shares, then the "
    "sources with the largest exact-integer remainders get the "
    "leftovers — proportional AND exactly totalling the target, which "
    "floor-only or round-only allocation cannot guarantee), then each "
    "source contributes its first quota docs by salted-md5 order "
    "(content-addressed, stable under reruns). The allocation windows "
    "run on the SOURCE table (vocabulary-sized — the one place a "
    "plain ORDER BY window is fine); the per-doc rank is a keyed "
    "window. Everything is exact integer arithmetic",
)
def pipeline_eval_holdout(spark, sf_dir):
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = per.agg(F.sum("n").cast("long").alias("total"))
    q = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        ((F.lit(_HOLDOUT) * F.col("n")) / F.col("total")).cast("long").alias(
            "quota"
        ),
        ((F.lit(_HOLDOUT) * F.col("n")) % F.col("total")).cast("long").alias(
            "rem"
        ),
    )
    l = q.agg((F.lit(_HOLDOUT) - F.sum("quota")).cast("long").alias("leftover"))
    a = q.withColumn(
        "pri", F.row_number().over(W.orderBy(F.col("rem").desc(), F.col("source")))
    )
    alloc = a.crossJoin(F.broadcast(l)).select(
        "source",
        (
            F.col("quota")
            + F.when(F.col("pri") <= F.col("leftover"), 1).otherwise(0)
        ).alias("k"),
    )
    h = F.md5(F.concat(F.lit("hold:"), F.col("doc_id").cast("string")))
    rk = d.select(
        "doc_id",
        "source",
        F.row_number()
        .over(W.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("rank_in_source"),
    )
    return rk.join(F.broadcast(alloc), "source").where(
        F.col("rank_in_source") <= F.col("k")
    ).select("doc_id", "source", "rank_in_source")


@register(
    "pipeline_quality_ensemble",
    section="2.9",
    oracle="""
    WITH t AS (
      SELECT doc_id, LENGTH(text) AS L,
             string_split(text, ' ') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, L, len(toks) AS n,
             list_max(list_transform(list_distinct(toks),
               x -> len(list_filter(toks, y -> y = x)))) AS top_cnt,
             len(list_transform(range(1, greatest(len(toks) - 1, 1)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
               AS n_tri,
             len(list_distinct(list_transform(
                 range(1, greatest(len(toks) - 1, 1)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
               AS n_tri_uniq
      FROM t),
    f AS (
      SELECT doc_id, n,
             (n BETWEEN 30 AND 2000) AS len_ok,
             (L - n + 1 >= 2 * n AND L - n + 1 <= 12 * n) AS wordlen_ok,
             (top_cnt * 5 <= n) AS toptok_ok,
             (n_tri_uniq * 10 >= n_tri * 7) AS rep_ok
      FROM s)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           (len_ok AND wordlen_ok AND toptok_ok AND rep_ok) AS keep,
           COALESCE(array_to_string(list_sort(
             [x FOR x IN [CASE WHEN NOT len_ok THEN 'length' END,
                          CASE WHEN NOT wordlen_ok THEN 'word_len' END,
                          CASE WHEN NOT toptok_ok THEN 'top_token' END,
                          CASE WHEN NOT rep_ok THEN 'repetition' END]
              IF x IS NOT NULL]), ','), '') AS reasons
    FROM f
    """,
    notes="multi-signal quality gate with EXPLAINABLE verdicts (the "
    "FineWeb/Gopher-rule ensemble as one declared pass): token-count "
    "bounds, mean word length, top-token concentration, and duplicate "
    "3-gram fraction, each thresholded in exact integer arithmetic "
    "(top_cnt*5 <= n is 'top token <= 20%' with no division), plus a "
    "sorted reasons list naming every failed rule — curation debugging "
    "needs to know WHY a doc dropped, not just that it did. Entirely "
    "per-row array expressions: ZERO shuffles, a pure map at any "
    "scale. The in-array top-token count is O(distinct x n) per doc — "
    "bounded by doc length, the right trade vs an explode + two "
    "shuffles per signal",
)
def pipeline_quality_ensemble(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.length("text").alias("L"),
        F.split("text", " ").alias("toks"),
    ).select("doc_id", "L", "toks", F.size("toks").alias("n"))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda x: F.size(F.filter("toks", lambda y: y == x)),
        )
    )
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(F.col("n") - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i),
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
        ),
    )
    s = t.select(
        "doc_id",
        "L",
        "n",
        top_cnt.alias("top_cnt"),
        F.size(tri).alias("n_tri"),
        F.size(F.array_distinct(tri)).alias("n_tri_uniq"),
    )
    len_ok = F.col("n").between(30, 2000)
    wordlen_ok = ((F.col("L") - F.col("n") + 1) >= 2 * F.col("n")) & (
        (F.col("L") - F.col("n") + 1) <= 12 * F.col("n")
    )
    toptok_ok = F.col("top_cnt") * 5 <= F.col("n")
    rep_ok = F.col("n_tri_uniq") * 10 >= F.col("n_tri") * 7
    reasons = F.array_join(
        F.array_sort(
            F.filter(
                F.array(
                    F.when(~len_ok, F.lit("length")),
                    F.when(~wordlen_ok, F.lit("word_len")),
                    F.when(~toptok_ok, F.lit("top_token")),
                    F.when(~rep_ok, F.lit("repetition")),
                ),
                lambda x: x.isNotNull(),
            )
        ),
        ",",
    )
    return s.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        (len_ok & wordlen_ok & toptok_ok & rep_ok).alias("keep"),
        reasons.alias("reasons"),
    )


_DP_EPS = 1.0  # per-release privacy budget; Laplace scale b = 1/eps


@register(
    "pipeline_dp_histogram",
    section="2.9",
    oracle=f"""
    WITH b AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    u AS (
      SELECT event_type, day, n,
             (('0x' || substr(md5('dp:' || event_type || '|'
                                  || CAST(day AS VARCHAR)), 1, 13))::BIGINT
              + 1.0) / {_TWO_52} AS u
      FROM b),
    z AS (
      SELECT event_type, day, n,
             -(1.0 / {_DP_EPS})
             * CASE WHEN u < 0.5 THEN -1.0 ELSE 1.0 END
             * ln(GREATEST(1e-12, 1.0 - 2.0 * abs(u - 0.5))) AS noise
      FROM u)
    SELECT event_type, day,
           ROUND(GREATEST(0.0, n + noise), 4) AS dp_count,
           CAST(CASE WHEN abs(noise) <= 10.0 / {_DP_EPS}
                THEN 1 ELSE 0 END AS BIGINT) AS noise_in_tail_bound
    FROM z
    """,
    notes="differentially-private release histogram: per-(type, day) "
    "distinct-user counts + Laplace(1/eps) noise, eps = 1. The noise "
    "is DERANDOMIZED for reproducibility: a content-addressed 52-bit "
    "md5 uniform feeds the inverse-CDF -b*sign(u-.5)*ln(1-2|u-.5|) — "
    "same release every run, same on both engines (a production "
    "release would swap in a sealed RNG seed; the pipeline shape is "
    "identical). ln() is libm-variant, so the released value ROUNDs "
    "4 dp (the fn_math discipline); GREATEST guards the 2^-52 u=1 "
    "edge and clamps negatives to 0 post-noise. The tail-bound flag "
    "(|noise| <= 10b, true at probability 1 - e^-10) doubles as a "
    "sanity check that the inverse-CDF is scaled right",
)
def pipeline_dp_histogram(spark, sf_dir):
    """The privacy gate of a data-release pipeline: exact sensitive
    counts never leave the engine, only noised ones. One keyed
    distinct-count (the only shuffle), then per-row noise arithmetic
    in codegen — the DP step adds zero distributed cost at any scale.
    Deterministic content-addressed uniforms keep the release
    reproducible and diffable across reruns."""
    ev = table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.countDistinct("user_id").cast("long").alias("n"))
    h = F.md5(
        F.concat(
            F.lit("dp:"),
            F.col("event_type"),
            F.lit("|"),
            F.col("day").cast("string"),
        )
    )
    u = (F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + 1.0) / F.lit(
        _TWO_52
    )
    sign = F.when(u < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
    noise = (
        F.lit(-1.0 / _DP_EPS)
        * sign
        * F.log(F.greatest(F.lit(1e-12), 1.0 - 2.0 * F.abs(u - 0.5)))
    )
    return b.select(
        "event_type",
        "day",
        F.round(F.greatest(F.lit(0.0), F.col("n") + noise), 4).alias(
            "dp_count"
        ),
        (F.abs(noise) <= 10.0 / _DP_EPS).cast("long").alias(
            "noise_in_tail_bound"
        ),
    )
