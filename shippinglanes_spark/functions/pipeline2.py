"""Training-data pipeline pack, part 2 (SURVEY §2.9 continued).

The curation stages between "deduped corpus" and "training shards" that
part 1 (pipeline.py) doesn't cover:

- `pipeline_quality_gopher`: repetition/quality heuristics in the style
  of published corpus-filtering rules (token-count bounds, unique-token
  ratio, most-frequent-token fraction, mean token length, duplicate
  3-gram ratio) -> keep/drop flag. All signals are exact integer ratios,
  so the filter is engine-deterministic — no float fuzz in the gate.
- `pipeline_domain_mix`: deterministic mixture resampling — each source
  gets a target retention rate and rows are kept when a salted-md5 hex
  prefix falls under the rate's hex threshold. Lexicographic compare of
  fixed-width lowercase hex IS the numeric compare, so no engine ever
  parses hex to int and the sample is stable across runs AND engines
  (`rand()` is neither).
- `pipeline_shuffle_shards`: the global-shuffle-before-training step,
  done the scale-safe way: hash-assign each doc to a shard (md5 nibble),
  then order *within* the shard by the hash — equivalent in distribution
  to a global random permutation but needs only a per-shard sort, never
  a total order over the corpus.
- `pipeline_pii_scrub`: regex redaction of synthetic PII (emails /
  phone numbers injected deterministically from doc_id so both engines
  see identical inputs); proves the scrub by redaction flags + scrubbed
  digest, all inside Catalyst regexp_replace (no Python in the row path).
- `text_heavy_hitters`: corpus-level frequent-token mining — tokens
  holding >= 1% of corpus mass. Map-side-combined count + broadcast
  scalar total; the 100 TB shape (the heavy-hitter set is tiny by
  definition, the count is one keyed shuffle).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import register
from .text import shingles

_TOKS_SQL = "list_filter(regexp_split_to_array(text, '[^a-z0-9]+'), x -> x <> '')"


@register(
    "pipeline_quality_gopher",
    section="2.9",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    c AS (SELECT doc_id, tok, COUNT(*) AS n FROM u GROUP BY doc_id, tok),
    s AS (SELECT doc_id,
                 CAST(SUM(n) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_unique,
                 CAST(MAX(n) AS BIGINT) AS max_cnt,
                 CAST(SUM(n * len(tok)) AS BIGINT) AS sum_len
          FROM c GROUP BY doc_id),
    sh AS (SELECT doc_id,
                  unnest(list_transform(
                    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                    i -> string_split(text, ' ')[i] || ' ' ||
                         string_split(text, ' ')[i+1] || ' ' ||
                         string_split(text, ' ')[i+2])) AS shingle
           FROM documents),
    g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
                 CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_sh_uniq
          FROM sh GROUP BY doc_id)
    SELECT s.doc_id, s.n_tokens,
           CAST(s.n_unique AS DOUBLE) / s.n_tokens AS unique_ratio,
           CAST(s.max_cnt AS DOUBLE) / s.n_tokens AS top_frac,
           CAST(s.sum_len AS DOUBLE) / s.n_tokens AS mean_len,
           CASE WHEN COALESCE(g.n_sh, 0) = 0 THEN 0.0
                ELSE 1.0 - CAST(g.n_sh_uniq AS DOUBLE) / g.n_sh END
             AS dup_3gram_ratio,
           CAST(s.n_tokens BETWEEN 20 AND 90
                AND CAST(s.n_unique AS DOUBLE) / s.n_tokens >= 0.35
                AND CAST(s.max_cnt AS DOUBLE) / s.n_tokens <= 0.15
                AND CAST(s.sum_len AS DOUBLE) / s.n_tokens BETWEEN 3.8 AND 5.2
                AS INT) AS keep
    FROM s LEFT JOIN g ON s.doc_id = g.doc_id
    """,
    notes="Gopher-style quality gate: token-count bounds, unique-token "
    "ratio, top-token fraction, mean token length, duplicate-3-gram "
    "ratio -> keep flag. Signals are exact integer divisions (engine-"
    "deterministic); two map-side-combined aggregations joined on doc_id",
)
def pipeline_quality_gopher(spark, sf_dir):
    """Per-document repetition/quality signals in the style of published
    corpus-filtering heuristics, ending in a keep/drop gate.

    Every signal is per-document, so the whole query is PER-ROW compute:
    sort the token array once and run a single-pass run-length aggregate
    (a higher-order F.aggregate carrying (prev, run, maxrun, uniq, n,
    sum_len) state) — that yields token count, distinct count, max
    token multiplicity, and summed length in O(n log n) per row with
    ZERO shuffles. The duplicate-3-gram ratio is size/array_distinct on
    the shingle array, also per-row. The previous formulation exploded
    tokens into a two-level groupBy + a countDistinct branch + a re-join
    (three shuffles, two corpus parses): 4.4s -> 0.6s warm at sf0.1, and
    at 100 TB this version is a pure map over the corpus. fan_out lifts
    the per-row work off the fixture's single parquet split."""
    from ..core import fan_out

    d = fan_out(table(spark, sf_dir, "documents"))
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    srt = F.array_sort(toks)
    is_run = lambda acc, x: acc["prev"].isNotNull() & (x == acc["prev"])  # noqa: E731
    run_next = lambda acc, x: F.when(is_run(acc, x), acc["run"] + 1).otherwise(  # noqa: E731
        F.lit(1)
    )
    st = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("maxrun"),
            F.lit(0).cast("long").alias("uniq"),
            F.lit(0).cast("long").alias("n"),
            F.lit(0).cast("long").alias("slen"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_next(acc, x).alias("run"),
            F.greatest(acc["maxrun"], run_next(acc, x)).alias("maxrun"),
            (acc["uniq"] + F.when(is_run(acc, x), 0).otherwise(1)).alias(
                "uniq"
            ),
            (acc["n"] + 1).alias("n"),
            (acc["slen"] + F.length(x)).alias("slen"),
        ),
    )
    sh = shingles(F.col("text"))
    base = d.select(
        "doc_id",
        st.alias("s"),
        F.size(sh).cast("long").alias("n_sh"),
        F.size(F.array_distinct(sh)).cast("long").alias("n_sh_uniq"),
    ).select(
        "doc_id",
        F.col("s.n").alias("n_tokens"),
        F.col("s.uniq").alias("n_unique"),
        F.col("s.maxrun").alias("max_cnt"),
        F.col("s.slen").alias("sum_len"),
        "n_sh",
        "n_sh_uniq",
    )
    unique_ratio = F.col("n_unique").cast("double") / F.col("n_tokens")
    top_frac = F.col("max_cnt").cast("double") / F.col("n_tokens")
    mean_len = F.col("sum_len").cast("double") / F.col("n_tokens")
    dup_ratio = F.when(F.col("n_sh") == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.col("n_sh_uniq").cast("double") / F.col("n_sh")
    )
    keep = (
        F.col("n_tokens").between(20, 90)
        & (unique_ratio >= 0.35)
        & (top_frac <= 0.15)
        & mean_len.between(3.8, 5.2)
    )
    # token-less docs have no row in the oracle's unnest-based CTE either
    return base.where(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        unique_ratio.alias("unique_ratio"),
        top_frac.alias("top_frac"),
        mean_len.alias("mean_len"),
        dup_ratio.alias("dup_3gram_ratio"),
        keep.cast("int").alias("keep"),
    )


@register(
    "pipeline_domain_mix",
    section="2.9",
    oracle="""
    SELECT doc_id, source,
           CAST(substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) <
                CASE CAST(substr(source, 4) AS INT) % 4
                     WHEN 0 THEN 'g'
                     WHEN 1 THEN '80000000'
                     WHEN 2 THEN '40000000'
                     ELSE '20000000' END
                AS INT) AS kept
    FROM documents
    """,
    notes="deterministic mixture resampling: per-source target rates "
    "(1.0 / 0.5 / 0.25 / 0.125 by source id mod 4) applied by comparing "
    "a salted-md5 hex prefix against the rate's hex threshold — "
    "fixed-width lowercase hex compares lexicographically AS numerically, "
    "so the sample is reproducible across engines with zero randomness",
)
def pipeline_domain_mix(spark, sf_dir):
    """The domain-mixture step of corpus curation: down-sample each
    source toward a target mixture. Hash-threshold sampling keeps the
    decision row-local (no shuffle at all) and content-addressed, so
    re-running over a grown corpus keeps every previously-kept row —
    exactly what incremental pipeline runs need. 'g' sorts after every
    hex digit, so rate 1.0 keeps all rows."""
    d = table(spark, sf_dir, "documents")
    h8 = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8
    )
    src_mod = (F.substring("source", 4, 10).cast("int") % 4)
    threshold = (
        F.when(src_mod == 0, "g")
        .when(src_mod == 1, "80000000")
        .when(src_mod == 2, "40000000")
        .otherwise("20000000")
    )
    return d.select(
        "doc_id", "source", (h8 < threshold).cast("int").alias("kept")
    )


@register(
    "pipeline_shuffle_shards",
    section="2.9",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5('shard:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents)
    SELECT doc_id,
           CAST(instr('0123456789abcdef', substr(hx, 1, 1)) - 1 AS BIGINT)
             AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY substr(hx, 1, 1) ORDER BY hx, doc_id) AS BIGINT)
             AS pos
    FROM h
    """,
    notes="deterministic global shuffle into 16 training shards: shard = "
    "first md5 nibble, position = rank of the full hash within the shard. "
    "Distributionally a global permutation, but executed as a keyed "
    "per-shard sort — no total order over the corpus, no single-partition "
    "window",
)
def pipeline_shuffle_shards(spark, sf_dir):
    """Shuffling a corpus before training without a global sort: a
    uniform hash splits docs into shards AND orders them within the
    shard, so the only data movement is one shuffle keyed by shard and
    each shard sorts independently — the formulation that survives a
    corpus too large to totally order."""
    d = table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy(F.substring("hx", 1, 1)).orderBy("hx", "doc_id")
    return d.select("doc_id", hx.alias("hx")).select(
        "doc_id",
        (
            F.expr("instr('0123456789abcdef', substring(hx, 1, 1))") - 1
        ).cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


@register(
    "pipeline_pii_scrub",
    section="2.9",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 3 <> 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example'
                  ELSE '' END ||
             CASE WHEN doc_id % 2 = 0
                  THEN ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS raw
      FROM documents),
    s AS (SELECT doc_id, raw,
                 regexp_replace(
                   regexp_replace(raw, '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                   '555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
          FROM aug)
    SELECT doc_id,
           CAST(scrubbed LIKE '%<EMAIL>%' AS INT) AS had_email,
           CAST(scrubbed LIKE '%<PHONE>%' AS INT) AS had_phone,
           CAST(len(scrubbed) AS BIGINT) AS scrubbed_len,
           md5(scrubbed) AS scrubbed_fp
    FROM s
    """,
    notes="PII redaction: synthetic emails/phones injected "
    "deterministically from doc_id (both engines build identical raw "
    "text), then regex-redacted; proven by redaction flags + scrubbed "
    "length + md5 digest. Pure Catalyst regexp_replace — no Python",
)
def pipeline_pii_scrub(spark, sf_dir):
    """The redaction pass run before text reaches a training corpus.
    The fixture corpus contains no real PII, so deterministic synthetic
    PII is appended (keyed off doc_id — identical on the oracle side)
    and then scrubbed; the digest comparison proves byte-level
    equivalence of the scrubbed output."""
    d = table(spark, sf_dir, "documents")
    email = F.when(
        F.col("doc_id") % 3 != 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example"),
        ),
    ).otherwise("")
    phone = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit(" tel 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise("")
    raw = F.concat(F.col("text"), email, phone)
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, "[a-z0-9]+@[a-z0-9.]+", "<EMAIL>"),
        "555-[0-9]{4}",
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        scrubbed.contains("<EMAIL>").cast("int").alias("had_email"),
        scrubbed.contains("<PHONE>").cast("int").alias("had_phone"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_fp"),
    )


@register(
    "text_heavy_hitters",
    section="2.9",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS_SQL}) AS token FROM documents),
    c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT token, n, CAST(n AS DOUBLE) / total AS share
    FROM c, tot
    WHERE CAST(n AS DOUBLE) / total >= 0.01
    """,
    notes="corpus heavy hitters: tokens holding >= 1% of corpus mass. "
    "Map-side-combined token count + broadcast scalar total; output is "
    "tiny by definition (<= 100 rows at any corpus size)",
)
def text_heavy_hitters(spark, sf_dir):
    """Frequent-token mining over the corpus — the exact formulation:
    one combinable count per token, one scalar total broadcast back.
    The result set is bounded (at most 1/threshold rows) regardless of
    corpus size, so this shape is constant-output at 100 TB."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    counts = (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = counts.agg(F.sum("n").cast("long").alias("total"))
    share = F.col("n").cast("double") / F.col("total")
    return (
        counts.crossJoin(F.broadcast(total))
        .where(share >= 0.01)
        .select("token", "n", share.alias("share"))
    )


@register(
    "pipeline_winsorize",
    section="2.9",
    oracle="""
    WITH b AS (
      SELECT source,
             quantile_cont(n_chars, 0.10) AS lo,
             quantile_cont(n_chars, 0.90) AS hi
      FROM documents GROUP BY source)
    SELECT d.doc_id, d.source, d.n_chars,
           ROUND(b.lo, 4) AS lo, ROUND(b.hi, 4) AS hi,
           ROUND(CASE WHEN d.n_chars < b.lo THEN b.lo
                      WHEN d.n_chars > b.hi THEN b.hi
                      ELSE CAST(d.n_chars AS DOUBLE) END, 4) AS clipped
    FROM documents d JOIN b USING (source)
    """,
    notes="per-source winsorization: clip n_chars to the group's "
    "[p10, p90] (linear-interpolated percentiles — Spark percentile == "
    "DuckDB quantile_cont). The bounds table is group-count-sized and "
    "broadcasts; clipping is row-local. ROUND 4 dp on the interpolated "
    "values",
)
def pipeline_winsorize(spark, sf_dir):
    """Outlier clipping before feature normalization: per-group
    percentile bounds (one combinable-ish aggregation over the grouping
    key) broadcast back onto the rows. The exact `percentile` is safe
    here because groups are few and the percentile buffers per-GROUP
    values — the same routing rule SCALING.md documents for
    agg_quantiles vs the sketch."""
    d = table(spark, sf_dir, "documents")
    b = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.10)").alias("lo"),
        F.expr("percentile(n_chars, 0.90)").alias("hi"),
    )
    clipped = (
        F.when(F.col("n_chars") < F.col("lo"), F.col("lo"))
        .when(F.col("n_chars") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("n_chars").cast("double"))
    )
    return d.join(F.broadcast(b), "source").select(
        "doc_id",
        "source",
        "n_chars",
        F.round("lo", 4).alias("lo"),
        F.round("hi", 4).alias("hi"),
        F.round(clipped, 4).alias("clipped"),
    )


@register(
    "profile_key_skew",
    section="2.9",
    oracle="""
    WITH kc AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id),
    dec AS (
      SELECT *, CAST(NTILE(10) OVER (ORDER BY n, user_id) AS BIGINT) AS decile
      FROM kc),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(MAX(n) AS BIGINT) AS max_n FROM kc)
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           FLOOR(CAST(SUM(n) AS DOUBLE) / t.total * 1000000) / 1000000.0
             AS share,
           FLOOR(CAST(MAX(n) AS DOUBLE) / t.max_n * 1000000) / 1000000.0
             AS rel_to_hottest
    FROM dec CROSS JOIN tot t
    GROUP BY decile, t.total, t.max_n
    """,
    notes="shuffle-key skew profiler: per-key counts bucketed into "
    "count-ordered deciles, each decile's row share and its hottest "
    "key's size relative to the global hottest — the diagnostic that "
    "tells you whether a join/groupBy key needs salting BEFORE the job "
    "runs. Deciles assigned by the two-pass bucketed_global_rank (the "
    "key table itself can be billions of rows at 100 TB, so no "
    "single-partition NTILE); shares are exact-integer ratios, "
    "floor-disciplined",
)
def profile_key_skew(spark, sf_dir):
    """Operational pre-flight for 100 TB joins: how unbalanced is this
    key? One map-side-combined count per key, then count-ordered decile
    assignment via the distributed two-pass global rank (windows.py) —
    the key table is data-sized, not metadata-sized, so NTILE's global
    window would be the exact single-partition trap this repo avoids.
    A hot-key table (hottest decile holding most of the mass) is the
    signal to reach for plans/skew.salted_join or AQE skew handling."""
    from ..operators.windows import bucketed_global_rank

    ev = table(spark, sf_dir, "events")
    kc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    ranked, n_keys = bucketed_global_rank(kc, "n", "user_id")
    # NTILE(10) in closed form from the global row number: first r tiles
    # take q+1 rows, the rest q (q = n//10, r = n%10)
    q, r = n_keys // 10, n_keys % 10
    big_span = r * (q + 1)
    rn = F.col("rn")
    decile = (
        F.when(rn <= big_span, F.ceil(rn / F.lit(q + 1)))
        .otherwise(r + F.ceil((rn - big_span) / F.lit(max(q, 1))))
        .cast("long")
    )
    dec = ranked.withColumn("decile", decile)
    tot = kc.agg(
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("max_n"),
    )
    return (
        dec.crossJoin(F.broadcast(tot))
        .groupBy("decile", "total", "max_n")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_n_dec"),
        )
        .select(
            "decile",
            "n_keys",
            "n_rows",
            (
                F.floor(F.col("n_rows").cast("double") / F.col("total") * 1000000)
                / 1000000.0
            ).alias("share"),
            (
                F.floor(
                    F.col("max_n_dec").cast("double") / F.col("max_n") * 1000000
                )
                / 1000000.0
            ).alias("rel_to_hottest"),
        )
    )


@register(
    "pipeline_dedup_keep_best",
    section="2.9",
    oracle="""
    WITH f AS (SELECT doc_id, n_chars,
                      md5(lower(trim(text))) AS fp
               FROM documents),
    r AS (SELECT fp, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY fp
                                    ORDER BY n_chars DESC, doc_id DESC) AS rn,
                 COUNT(*) OVER (PARTITION BY fp) AS gs
          FROM f)
    SELECT fp,
           CAST(gs AS BIGINT) AS group_size,
           CAST(doc_id AS BIGINT) AS kept_doc
    FROM r WHERE rn = 1
    """,
    notes="exact dedup that keeps the BEST representative per content "
    "fingerprint (longest doc, doc_id tiebreak) — the keep-rule curation "
    "pipelines actually want, vs dedup_exact's drop-all-copies count. "
    "Ordering key is a STRUCT (n_chars, doc_id): lexicographic struct "
    "comparison on both engines, no integer-packing capacity bound (the "
    "former n_chars*10M+doc_id key silently bled the tiebreak into the "
    "length ordering once doc_id >= 10M). One hash aggregate on the "
    "fingerprint; shuffle bytes independent of document size",
)
def pipeline_dedup_keep_best(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    rank_key = F.struct(F.col("n_chars"), F.col("doc_id"))
    return (
        d.select("doc_id", "n_chars", fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.max_by("doc_id", rank_key).cast("long").alias("kept_doc"),
        )
    )


@register(
    "pipeline_ngram_lm",
    section="2.9",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    tri AS (SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
            FROM t),
    c3 AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n3 FROM tri GROUP BY g),
    c2 AS (SELECT string_split(g, ' ')[1] || ' ' || string_split(g, ' ')[2] AS ctx,
                  CAST(SUM(n3) AS BIGINT) AS n2
           FROM c3 GROUP BY 1)
    SELECT c3.g AS trigram, c3.n3,
           FLOOR(CAST(c3.n3 AS DOUBLE) / c2.n2 * 1000000) / 1000000.0 AS p_cond
    FROM c3 JOIN c2
      ON string_split(c3.g, ' ')[1] || ' ' || string_split(c3.g, ' ')[2] = c2.ctx
    WHERE c3.n3 >= 5
    """,
    notes="count-based trigram LM: P(w3 | w1 w2) = c(w1w2w3)/c(w1w2-prefix) "
    "— trigram counts once, context counts DERIVED from them (sum over "
    "the trigram table, never a second corpus pass), one equi-join on "
    "the context key; floor-disciplined ratios. The shape of every "
    "count-based LM / tokenizer-scoring build",
)
def pipeline_ngram_lm(spark, sf_dir):
    from ..core import fan_out
    from .text import shingles_of_tokens

    d = fan_out(table(spark, sf_dir, "documents").select("text"))
    tri = (
        d.select(F.split("text", " ").alias("__toks"))
        .select(F.explode(shingles_of_tokens(F.col("__toks"))).alias("g"))
        .where(F.col("g") != "")
    )
    c3 = tri.groupBy("g").agg(F.count(F.lit(1)).alias("n3")).localCheckpoint()
    ctx_of = F.concat_ws(
        " ",
        F.element_at(F.split("g", " "), 1),
        F.element_at(F.split("g", " "), 2),
    )
    c2 = c3.groupBy(ctx_of.alias("ctx")).agg(F.sum("n3").cast("long").alias("n2"))
    return (
        c3.where(F.col("n3") >= 5)
        .join(c2, ctx_of == F.col("ctx"))
        .select(
            F.col("g").alias("trigram"),
            "n3",
            (F.floor(F.col("n3").cast("double") / F.col("n2") * 1_000_000)
             / 1_000_000.0).alias("p_cond"),
        )
    )


@register(
    "pipeline_dataset_card",
    section="2.9",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(COUNT(*) FILTER (WHERE n_chars < 100) AS BIGINT) AS n_short
    FROM documents
    """,
    notes="one-row dataset card: the summary block every published corpus "
    "ships (doc/lang/source counts, token and char totals, short-doc "
    "tail) — a single pass of combinable aggregates, no shuffle beyond "
    "the final 1-row reduce",
)
def pipeline_dataset_card(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.count(F.when(F.col("n_chars") < 100, 1)).alias("n_short"),
    )
