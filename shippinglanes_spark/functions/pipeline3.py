"""Training-data pipeline pack 3 (SURVEY §2.9 extensions, round 4).

Four curation shapes a 100 TB corpus build needs beyond pack 1/2, plus
the degree view of the trade graph:

- `pipeline_token_budget`: per-source token totals and mixture weights —
  the sampling-ratio table every multi-source pretraining mix starts
  from. Exact integer ppm weights (DIV), one map-side-combined aggregate.
- `pipeline_curriculum_buckets`: per-source quality deciles (length as
  the stand-in score) via KEYED windows — partitioned by source, so no
  global sort exists anywhere; the decile edges are exact integer
  arithmetic on (row_number, count).
- `pipeline_kfold_assign`: content-addressed k-fold assignment (md5 of
  a salted doc key, two hex nibbles mod k) — stable across runs,
  machines, and engines; never rand(). The cross-validation analogue of
  pipeline_split.
- `pipeline_dedup_end2end`: the FULL near-dup pipeline as one declared
  query: MinHash-LSH candidates -> exact 3-gram Jaccard re-rank ->
  connected components -> keep the best (longest, doc_id tiebreak)
  representative per cluster. Every stage is the bucketed/pruned
  formulation; the oracle recomputes the whole chain with a recursive
  CTE + window rank in DuckDB — a full value check for the composition,
  not just the parts.
- `graph_degree_topk`: in/out degree + strength of the nation trade
  graph, top-10 by total strength — the profiling first-look before
  running anything iterative (pagerank/triangles) on a derived graph.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "pipeline_token_budget",
    section="2.9",
    oracle="""
    WITH per AS (SELECT source,
                        CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                          AS n_tokens
                 FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM per)
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens * 1000000 // t AS BIGINT) AS weight_ppm
    FROM per CROSS JOIN tot
    """,
    notes="per-source token totals + exact integer ppm mixture weights "
    "(the pretraining sampling-ratio table). One map-side-combined "
    "aggregate over the corpus; the totals row is a 1-row broadcast",
)
def pipeline_token_budget(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias(
            "n_tokens"
        ),
    )
    tot = per.agg(F.sum("n_tokens").cast("long").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("n_tokens * 1000000 DIV t").alias("weight_ppm"),
    )


@register(
    "pipeline_curriculum_buckets",
    section="2.9",
    oracle="""
    WITH r AS (SELECT source, n_chars,
                      ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY n_chars, doc_id) AS rn,
                      COUNT(*) OVER (PARTITION BY source) AS cnt
               FROM documents)
    SELECT source,
           CAST((rn - 1) * 10 // cnt AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM r GROUP BY 1, 2
    """,
    notes="per-source quality deciles (curriculum ordering): KEYED window "
    "rank partitioned by source — no global sort; bucket edges are exact "
    "integer arithmetic ((rn-1)*10 DIV cnt), so engines agree bit-for-bit. "
    "At 100 TB each source partitions independently; a skewed giant "
    "source would switch to the two-pass bucketed_global_rank",
)
def pipeline_curriculum_buckets(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    r = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return (
        r.select(
            "source", F.expr("(rn - 1) * 10 DIV cnt").alias("bucket"), "n_chars"
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "pipeline_kfold_assign",
    section="2.9",
    oracle="""
    WITH h AS (SELECT source,
                      len(string_split(text, ' ')) AS n_tok,
                      ((instr('0123456789abcdef',
                              substr(md5('fold:' || CAST(doc_id AS VARCHAR)),
                                     1, 1)) - 1) * 16
                       + instr('0123456789abcdef',
                               substr(md5('fold:' || CAST(doc_id AS VARCHAR)),
                                      2, 1)) - 1) % 5 AS fold
               FROM documents)
    SELECT fold, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM h GROUP BY 1, 2
    """,
    notes="content-addressed 5-fold assignment: two md5 hex nibbles of a "
    "salted doc key, mod k — reproducible across engines/runs (never "
    "rand()), join-stable, and uniform to 256%5 rounding. Per-(fold, "
    "source) doc/token accounting shows fold balance; zero shuffles "
    "beyond the final aggregate",
)
def pipeline_kfold_assign(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string")))
    nib = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(h, i, 1)
    ) - F.lit(1)
    fold = (nib(1) * 16 + nib(2)) % 5
    return (
        d.select(
            fold.cast("long").alias("fold"),
            "source",
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .groupBy("fold", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


@register(
    "pipeline_dedup_end2end",
    section="2.9",
    oracle="""
    WITH RECURSIVE
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                    AS shingle
           FROM t),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 25),
    edges AS (SELECT id_a AS src, id_b AS dst FROM inter
              UNION ALL SELECT id_b, id_a FROM inter),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    cc(id, label) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, c.label FROM cc c JOIN edges e ON c.id = e.src
    ),
    lab AS (SELECT id AS doc_id, MIN(label) AS cluster_id FROM cc GROUP BY id),
    ranked AS (SELECT lab.cluster_id, lab.doc_id, d.n_chars,
                      ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
                                         ORDER BY d.n_chars DESC,
                                                  lab.doc_id DESC) AS rn,
                      COUNT(*) OVER (PARTITION BY lab.cluster_id) AS sz
               FROM lab JOIN documents d ON lab.doc_id = d.doc_id)
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(sz AS BIGINT) AS cluster_size,
           CAST(doc_id AS BIGINT) AS kept_doc
    FROM ranked WHERE rn = 1
    """,
    notes="the FULL near-dup dedup pipeline in one query: MinHash-LSH "
    "banding candidates -> exact 3-gram Jaccard confirmation (>=25 "
    "common shingles) -> connected components -> keep the longest doc "
    "(doc_id tiebreak) per cluster. Every stage is the bucketed/pruned "
    "formulation (no all-pairs anywhere); the oracle replays the chain "
    "as recursive-CTE transitive closure + window rank — value-checking "
    "the composition end to end",
)
def pipeline_dedup_end2end(spark, sf_dir):
    from .text import connected_components, text_ngram_jaccard

    pairs = text_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    clusters = connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = clusters.join(d, "doc_id")
    return ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.max_by("doc_id", F.struct(F.col("n_chars"), F.col("doc_id")))
        .cast("long")
        .alias("kept_doc"),
    )


@register(
    "graph_degree_topk",
    section="2.9",
    oracle="""
    WITH e AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                      CAST(COUNT(*) AS BIGINT) AS w
               FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               GROUP BY 1, 2),
    outd AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS out_deg,
                    CAST(SUM(w) AS BIGINT) AS out_w
             FROM e GROUP BY src),
    ind AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS in_deg,
                   CAST(SUM(w) AS BIGINT) AS in_w
            FROM e GROUP BY dst)
    SELECT n.n_nationkey AS nation_id,
           COALESCE(o.out_deg, 0) AS out_deg,
           COALESCE(o.out_w, 0) AS out_w,
           COALESCE(i.in_deg, 0) AS in_deg,
           COALESCE(i.in_w, 0) AS in_w
    FROM nation n
    LEFT JOIN outd o ON n.n_nationkey = o.id
    LEFT JOIN ind i ON n.n_nationkey = i.id
    ORDER BY COALESCE(o.out_w, 0) + COALESCE(i.in_w, 0) DESC, nation_id
    LIMIT 10
    """,
    notes="degree/strength profile of the derived nation trade graph, "
    "top-10 by total strength — the first-look profiling step before "
    "iterative graph algorithms. The edge aggregate is the only big "
    "shuffle; degrees aggregate a nation-sized table and the top-k is "
    "TakeOrdered, never a global sort",
)
def graph_degree_topk(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            c.c_nationkey.alias("src"), s.s_nationkey.alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outd = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg"), F.sum("w").cast("long").alias("out_w")
    )
    ind = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg"), F.sum("w").cast("long").alias("in_w")
    )
    return (
        n.join(outd, n.n_nationkey == outd.id, "left")
        .join(ind, n.n_nationkey == ind.id, "left")
        .select(
            n.n_nationkey.alias("nation_id"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("out_w", F.lit(0)).alias("out_w"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("in_w", F.lit(0)).alias("in_w"),
        )
        .orderBy(
            (F.col("out_w") + F.col("in_w")).desc(), "nation_id"
        )
        .limit(10)
    )


@register(
    "pipeline_lm_score",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tri AS (SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                     AS g
            FROM t),
    c3 AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n3 FROM tri GROUP BY g),
    c2 AS (SELECT string_split(g, ' ')[1] || ' ' || string_split(g, ' ')[2]
                    AS ctx,
                  CAST(SUM(n3) AS BIGINT) AS n2
           FROM c3 GROUP BY 1),
    lm AS (SELECT c3.g, CAST(c3.n3 * 1000000 // c2.n2 AS BIGINT) AS ppm
           FROM c3 JOIN c2
             ON string_split(c3.g, ' ')[1] || ' ' ||
                string_split(c3.g, ' ')[2] = c2.ctx)
    SELECT tri.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tri,
           CAST(SUM(lm.ppm) // COUNT(*) AS BIGINT) AS avg_ppm
    FROM tri JOIN lm ON tri.g = lm.g
    GROUP BY tri.doc_id
    """,
    notes="LM-based quality scoring: score every document by the mean "
    "conditional probability of its trigrams under the corpus trigram "
    "LM (pipeline_ngram_lm's table) — the model-based filtering step "
    "after heuristic gates. Exact INTEGER ppm probabilities (n3*1e6 DIV "
    "n2) summed and integer-divided, so the distributed float-sum "
    "order-dependence problem never exists. Corpus pass -> LM counts -> "
    "one join back; at 100 TB the LM table is the top-k pruned "
    "vocabulary and broadcasts",
)
def pipeline_lm_score(spark, sf_dir):
    from ..core import fan_out
    from .text import shingles_of_tokens

    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    tri = (
        d.select("doc_id", F.split("text", " ").alias("__toks"))
        .select(
            "doc_id",
            F.explode(shingles_of_tokens(F.col("__toks"))).alias("g"),
        )
        .localCheckpoint()  # feeds the LM build AND the scoring join once
    )
    c3 = tri.groupBy("g").agg(F.count(F.lit(1)).alias("n3"))
    ctx_of = F.concat_ws(
        " ",
        F.element_at(F.split("g", " "), 1),
        F.element_at(F.split("g", " "), 2),
    )
    c2 = c3.groupBy(ctx_of.alias("ctx")).agg(
        F.sum("n3").cast("long").alias("n2")
    )
    lm = c3.join(c2, ctx_of == F.col("ctx")).select(
        "g", F.expr("n3 * 1000000 DIV n2").alias("ppm")
    )
    return (
        tri.join(lm, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.expr("SUM(ppm) DIV COUNT(*)").alias("avg_ppm"),
        )
    )


@register(
    "pipeline_bpe_merges",
    section="2.9",
    oracle="""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, greatest(len(tok), 1)),
                         i -> substr(tok, i, 2))) AS pair
           FROM w WHERE len(tok) >= 2)
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM bg WHERE len(pair) = 2
    GROUP BY pair ORDER BY n DESC, pair LIMIT 20
    """,
    notes="the first BPE merge table: corpus-wide adjacent character-pair "
    "counts within tokens, top-20 — the inner statistic of every "
    "byte-pair tokenizer build (each BPE iteration recomputes exactly "
    "this after applying the previous merge). Two-step explode keeps "
    "the substring generation codegen'd; count is map-side combined; "
    "top-k is TakeOrdered, never a global sort",
)
def pipeline_bpe_merges(spark, sf_dir):
    from ..core import fan_out

    d = fan_out(table(spark, sf_dir, "documents").select("text"))
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2)),
            )
        ).alias("pair")
    ).where(F.length("pair") == 2)
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


@register(
    "pipeline_chunk_overlap",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n,
                 unnest(range(0, greatest(len(toks), 1), 24)) AS start
          FROM t),
    c AS (SELECT doc_id,
                 CAST(start // 24 AS BIGINT) AS chunk_idx,
                 toks[start + 1 : least(start + 32, n)] AS chunk
          FROM s WHERE start < n)
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_tok,
           md5(array_to_string(chunk, ' ')) AS chunk_fp
    FROM c
    """,
    notes="RAG-style overlapping chunking: fixed 32-token windows at "
    "stride 24 (8-token overlap) — the retrieval-corpus preparation "
    "step between cleaning and embedding. Pure per-row array slicing "
    "(sequence of starts -> slice), content-addressed chunk "
    "fingerprints; zero shuffles — a 100 TB chunking pass is a pure "
    "map. Engine-agnostic windows: both sides slice the same "
    "whitespace token array",
)
def pipeline_chunk_overlap(spark, sf_dir):
    from ..core import fan_out

    CHUNK, STRIDE = 32, 24
    d = fan_out(table(spark, sf_dir, "documents").select("doc_id", "text"))
    t = d.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n")
    )
    s = t.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(STRIDE)
            )
        ).alias("start"),
    ).where(F.col("start") < F.col("n"))
    chunk = F.slice(F.col("toks"), F.col("start") + 1, F.lit(CHUNK))
    return s.select(
        "doc_id",
        F.expr(f"start DIV {STRIDE}").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


@register(
    "pipeline_oversample_minority",
    section="2.9",
    oracle="""
    WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                 FROM documents GROUP BY source),
    mx AS (SELECT MAX(n) AS target FROM per),
    k AS (SELECT source, n, GREATEST(target // n, 1) AS rep
          FROM per CROSS JOIN mx),
    blown AS (SELECT d.source, d.doc_id, UNNEST(range(k.rep)) AS copy
              FROM documents d JOIN k ON d.source = k.source)
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(MAX(copy) + 1 AS BIGINT) AS repeat_k,
           CAST(COUNT(*) AS BIGINT) AS n_after
    FROM blown GROUP BY source
    """,
    notes="deterministic minority oversampling: every source is repeated "
    "floor(max_count / count) times toward the majority size — "
    "integer repeat factors (no fractional sampling, no rand()), the "
    "class-rebalance step before training on skewed source mixes. The "
    "repeat table is metadata-sized and broadcast; the blow-up is one "
    "explode of a per-row sequence",
)
def pipeline_oversample_minority(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    mx = per.agg(F.max("n").alias("target"))
    k = per.crossJoin(F.broadcast(mx)).select(
        "source", F.greatest(F.expr("target DIV n"), F.lit(1)).alias("rep")
    )
    blown = (
        d.select("source", "doc_id")
        .join(F.broadcast(k), "source")
        .select(
            "source",
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("rep") - 1)).alias("copy"),
        )
    )
    return blown.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        (F.max("copy") + 1).cast("long").alias("repeat_k"),
        F.count(F.lit(1)).alias("n_after"),
    )


@register(
    "pipeline_incremental_dedup",
    section="2.9",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(lower(trim(text))) AS fp,
             substr(md5('ingest:' || CAST(doc_id AS VARCHAR)), 1, 1) AS nib
      FROM documents),
    inc AS (SELECT doc_id, fp FROM fp WHERE nib IN ('0', '1')),
    corp AS (SELECT DISTINCT fp FROM fp WHERE nib NOT IN ('0', '1'))
    SELECT i.doc_id,
           CASE WHEN c.fp IS NULL THEN 'new' ELSE 'dup_of_corpus' END
             AS status
    FROM inc i LEFT JOIN corp c ON i.fp = c.fp
    """,
    notes="ingestion-time incremental dedup: an incoming batch (a "
    "deterministic content-addressed ~12.5% slice — stand-in for today's "
    "crawl) is checked against the EXISTING corpus by content "
    "fingerprint (md5 of normalized text) and each incoming doc is "
    "labeled new / dup_of_corpus. The corpus side reduces to its "
    "distinct fingerprint index before the join, so the probe is "
    "fp-keyed hash join whose build side is fingerprints only — never "
    "document bodies; at 100 TB this is the standard pattern of joining "
    "the new partition against the persisted fingerprint index instead "
    "of re-deduplicating the whole corpus. Near-dup admission runs the "
    "same shape over MinHash band hashes (minhash.py); the exact "
    "fingerprint form here is fully value-oracled",
)
def pipeline_incremental_dedup(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    nib = F.substring(
        F.md5(F.concat(F.lit("ingest:"), F.col("doc_id").cast("string"))), 1, 1
    )
    fp = d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
        nib.alias("nib"),
    )
    inc = fp.where(F.col("nib").isin("0", "1")).select("doc_id", "fp")
    corp = (
        fp.where(~F.col("nib").isin("0", "1")).select("fp").distinct()
    )
    c = corp.withColumnRenamed("fp", "cfp")
    return inc.join(c, inc.fp == c.cfp, "left").select(
        "doc_id",
        F.when(F.col("cfp").isNull(), "new")
        .otherwise("dup_of_corpus")
        .alias("status"),
    )


@register(
    "dedup_embedding_lsh",
    section="2.9",
    oracle=None,
    notes="the 100 TB path of dedup_embedding: hyperplane-LSH bucketed "
    "candidate pairs (embedding_neardups — bucket-collect, sub-bucketed "
    "hot buckets, linear anchor pairs past the cap) -> connected "
    "components -> keep the smallest vec_id per cluster. No broadcast "
    "index and no MAX_INDEX_ROWS cap anywhere: every stage is bucket- "
    "or key-partitioned, so this composition survives arbitrary corpus "
    "size, unlike the exact-pair dedup_embedding whose pair stage "
    "broadcasts the index. Probabilistic recall (LSH) -> no value "
    "oracle; planted-duplicate collapse is asserted in tests/"
    "test_dedup.py and the keep-rule stage is the same code path "
    "dedup_embedding value-checks",
)
def dedup_embedding_lsh(spark, sf_dir):
    from .minhash import embedding_neardups
    from .text import connected_components

    emb = table(spark, sf_dir, "embeddings")
    pairs = embedding_neardups(spark, emb).select("id_a", "id_b")
    labels = connected_components(pairs)
    cluster = F.coalesce(F.col("label"), F.col("vec_id"))
    return (
        emb.select("vec_id")
        .join(labels, emb.vec_id == labels.id, "left")
        .select(
            "vec_id",
            cluster.alias("cluster_id"),
            (cluster == F.col("vec_id")).cast("int").alias("keep"),
        )
    )


@register(
    "pipeline_span_corrupt",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(range(1, len(toks) + 1),
                                i -> (i - 1) % 10 < 3)) AS BIGINT) AS n_masked,
           array_to_string(list_filter(
             list_transform(range(1, len(toks) + 1),
               i -> CASE WHEN (i - 1) % 10 = 0
                         THEN '<extra_' || CAST((i - 1) // 10 AS VARCHAR) || '>'
                         WHEN (i - 1) % 10 < 3 THEN ''
                         ELSE toks[i] END),
             x -> x <> ''), ' ') AS corrupted,
           array_to_string(list_filter(
             list_transform(range(1, len(toks) + 1),
               i -> CASE WHEN (i - 1) % 10 = 0
                         THEN '<extra_' || CAST((i - 1) // 10 AS VARCHAR) || '>'
                              || ' ' || toks[i]
                         WHEN (i - 1) % 10 < 3 THEN toks[i]
                         ELSE '' END),
             x -> x <> ''), ' ') AS target
    FROM t
    """,
    notes="T5-style span corruption as deterministic per-row data prep: "
    "every 10th token starts a 3-token masked span; masked spans are "
    "replaced by ordinal sentinels in `corrupted` and emitted after "
    "their sentinel in `target` — the (inputs, labels) pair a span-"
    "corruption pretraining objective consumes. The mask schedule is "
    "positional (no rand()), so both engines produce identical text; "
    "pure per-row higher-order array expressions, zero shuffles, "
    "embarrassingly parallel at corpus scale",
)
def pipeline_span_corrupt(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.col("__toks")

    def sentinel(i):
        return F.concat(
            F.lit("<extra_"), F.floor(i / 10).cast("string"), F.lit(">")
        )

    def corrupted(x, i):
        return (
            F.when(i % 10 == 0, sentinel(i))
            .when(i % 10 < 3, F.lit(""))
            .otherwise(x)
        )

    def target(x, i):
        return (
            F.when(i % 10 == 0, F.concat(sentinel(i), F.lit(" "), x))
            .when(i % 10 < 3, x)
            .otherwise(F.lit(""))
        )

    keep = lambda x: x != ""  # noqa: E731
    return d.select("doc_id", F.split("text", " ").alias("__toks")).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(
            F.filter(F.sequence(F.lit(1), F.size(toks)), lambda i: (i - 1) % 10 < 3)
        ).cast("long").alias("n_masked"),
        F.concat_ws(" ", F.filter(F.transform(toks, corrupted), keep)).alias(
            "corrupted"
        ),
        F.concat_ws(" ", F.filter(F.transform(toks, target), keep)).alias(
            "target"
        ),
    )
