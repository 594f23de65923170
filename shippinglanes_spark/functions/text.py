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


@register(
    "fn_token_count",
    section="2.9",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                                x -> x <> '')) AS INT) AS n_tokens,
           CAST(len(list_distinct(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                                              x -> x <> ''))) AS INT) AS n_unique
    FROM documents
    """,
    notes="BPE-ish regex token counting (alnum runs), total + distinct",
)
def fn_token_count(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    )


_LANG_MARKERS = [("the", "en"), ("data", "es"), ("table", "fr"),
                 ("join", "de"), ("window", "zh")]


@register(
    "text_langid",
    section="2.9",
    oracle="""
    WITH c AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x = 'the')) AS c0,
             len(list_filter(string_split(text, ' '), x -> x = 'data')) AS c1,
             len(list_filter(string_split(text, ' '), x -> x = 'table')) AS c2,
             len(list_filter(string_split(text, ' '), x -> x = 'join')) AS c3,
             len(list_filter(string_split(text, ' '), x -> x = 'window')) AS c4
      FROM documents)
    SELECT doc_id,
           CASE WHEN c0 > 0 AND c0 >= GREATEST(c1, c2, c3, c4) THEN 'en'
                WHEN c1 > 0 AND c1 >= GREATEST(c2, c3, c4) THEN 'es'
                WHEN c2 > 0 AND c2 >= GREATEST(c3, c4) THEN 'fr'
                WHEN c3 > 0 AND c3 >= c4 THEN 'de'
                WHEN c4 > 0 THEN 'zh'
                ELSE 'und' END AS pred_lang,
           CAST(CASE WHEN c0 > 0 AND c0 >= GREATEST(c1, c2, c3, c4) THEN 'en'
                WHEN c1 > 0 AND c1 >= GREATEST(c2, c3, c4) THEN 'es'
                WHEN c2 > 0 AND c2 >= GREATEST(c3, c4) THEN 'fr'
                WHEN c3 > 0 AND c3 >= c4 THEN 'de'
                WHEN c4 > 0 THEN 'zh'
                ELSE 'und' END = lang AS INT) AS is_match
    FROM c
    """,
    notes="marker-token argmax language ID (fixture vocab is shared across langs, "
    "so accuracy is chance — the operator mechanism is what's exercised)",
)
def text_langid(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    def count_marker(marker):
        # single-arg lambda: a two-arg lambda would make F.filter pass
        # (element, index) and compare tokens against positions
        return F.size(F.filter(toks, lambda x: x == marker))

    counts = [
        count_marker(marker).alias(f"c{i}")
        for i, (marker, _) in enumerate(_LANG_MARKERS)
    ]
    c = d.select("doc_id", "lang", *counts)
    pred = F.lit("und")
    for i in reversed(range(len(_LANG_MARKERS))):
        ci = F.col(f"c{i}")
        rest = [F.col(f"c{j}") for j in range(i + 1, len(_LANG_MARKERS))]
        if len(rest) >= 2:
            cond = (ci > 0) & (ci >= F.greatest(*rest))
        elif len(rest) == 1:
            cond = (ci > 0) & (ci >= rest[0])
        else:
            cond = ci > 0
        pred = F.when(cond, _LANG_MARKERS[i][1]).otherwise(pred)
    return c.select(
        "doc_id",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).cast("int").alias("is_match"),
    )


def shingles(text_col, k: int = 3):
    """k-gram word shingles as an array column (1-based element_at to
    mirror DuckDB list indexing).

    Documents with fewer than k tokens yield an empty array: Spark's
    sequence(1, stop) with stop < 1 produces a *descending* sequence
    (not empty), which would drive element_at out of bounds — so the
    short-doc case is guarded explicitly, matching DuckDB's empty list.

    PERF: this inlines split(text) k+1 times inside a higher-order
    lambda, which Catalyst evaluates INTERPRETED (HOFs break codegen)
    with no common-subexpression elimination — fine in a plain
    projection, but ~10x slower when the expression sits under a
    Generate/explode. Hot paths should tokenize in a SEPARATE select
    first and call shingles_of_tokens on the materialized column
    (CollapseProject will not re-inline a multiply-referenced non-cheap
    alias, so the split stays computed once per row)."""
    return shingles_of_tokens(F.split(text_col, " "), k)


def shingles_of_tokens(toks, k: int = 3):
    """k-gram shingles from an ALREADY-TOKENIZED array column — the
    explode-friendly form (see shingles() perf note)."""
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + off) for off in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "text_ngram_jaccard",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b, i AS n_common,
           ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i), 4) AS jaccard
    FROM inter
    JOIN sz na ON id_a = na.doc_id
    JOIN sz nb ON id_b = nb.doc_id
    WHERE i >= 25
    """,
    notes="exact 3-gram Jaccard re-rank over MinHash-LSH candidate pairs "
    "(minhash.py) — the all-pairs shingle self-join never runs; LSH recall "
    "on the >=25-common-shingle pairs is 1.0 at fixture scale (all such "
    "pairs have jaccard >= 0.98, far above the 32-hash/8-band threshold), "
    "so the exact all-pairs oracle still hash-matches",
)
def text_ngram_jaccard(spark, sf_dir):
    """Near-dup re-rank, composed the 100 TB way: LSH banding proposes
    candidate pairs (bucketed equi-join, minhash.py), then the exact
    3-gram intersection is computed *only for candidates* by joining the
    pair list against each side's shingles — cost scales with candidate
    count x shingles/doc, never with all matching-shingle pairs."""
    from ..core import fan_out
    from .minhash import minhash_candidates

    d = table(spark, sf_dir, "documents")
    # The candidate list feeds two consumers (doc prune + pair join) and
    # the shingle set three (both join sides + sizes); without a
    # materialization barrier each consumer re-runs the whole upstream
    # pipeline (broadcast subtrees defeat exchange reuse — see STATE.md),
    # so both are checkpointed once.
    cand = minhash_candidates(d).localCheckpoint()
    # Prune FIRST: only documents appearing in a candidate pair need
    # their shingle sets materialized — at scale this is the difference
    # between re-ranking a few near-dup clusters and re-shuffling the
    # whole corpus's shingles.
    cand_docs = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        fan_out(d.select("doc_id", "text"))
        .join(F.broadcast(cand_docs), "doc_id")
        # two-step tokenize-then-shingle (the r4 HOF-under-Generate
        # lesson shingles() itself documents): inlining split() into the
        # exploded HOF evaluates it interpreted per generated row —
        # measured 0.81 -> 0.44 s for this stage at sf0.1
        .select("doc_id", F.split("text", " ").alias("__toks"))
        .select(
            "doc_id",
            F.explode(shingles_of_tokens(F.col("__toks"))).alias("shingle"),
        )
        .where(F.col("shingle") != "")
        .distinct()
        .localCheckpoint()
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    inter = (
        F.broadcast(cand)
        .join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(
            sb,
            (F.col("id_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
        .where(F.col("i") >= 25)
    )
    na = sz.alias("na")
    nb = sz.alias("nb")
    return (
        inter.join(na, F.col("id_a") == F.col("na.doc_id"))
        .join(nb, F.col("id_b") == F.col("nb.doc_id"))
        .select(
            "id_a",
            "id_b",
            F.col("i").alias("n_common"),
            F.round(
                F.col("i").cast("double")
                / (F.col("na.n") + F.col("nb.n") - F.col("i")),
                4,
            ).alias("jaccard"),
        )
    )


@register(
    "udtf_explode",
    section="2.11",
    oracle="""
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, CAST(pos AS INT) AS pos, token FROM (
      SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS token FROM s)
    """,
    notes="table function: one row per token with position (posexplode; "
    "DuckDB side zips parallel unnests)",
)
def udtf_explode(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@register(
    "text_sentiment",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> x IN ('fast', 'small'))) AS BIGINT) AS pos,
           CAST(len(list_filter(toks, x -> x IN ('slow', 'big'))) AS BIGINT) AS neg,
           ROUND((len(list_filter(toks, x -> x IN ('fast', 'small')))
                  - len(list_filter(toks, x -> x IN ('slow', 'big'))))
                 / CAST(len(toks) AS DOUBLE), 4) AS score
    FROM t
    """,
    notes="lexicon-based sentiment scoring (EDBT'16 Spark-sentiment theme); "
    "lexicon drawn from the fixture vocabulary",
)
def text_sentiment(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pos = F.size(F.filter(toks, lambda x: x.isin("fast", "small")))
    neg = F.size(F.filter(toks, lambda x: x.isin("slow", "big")))
    return d.select(
        "doc_id",
        pos.cast("long").alias("pos"),
        neg.cast("long").alias("neg"),
        F.round((pos - neg) / F.size(toks).cast("double"), 4).alias("score"),
    )


@register(
    "pipeline_clean_corpus",
    section="2.9",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source, n_chars,
             LENGTH(text) AS L,
             md5(lower(trim(text))) AS fp
      FROM documents),
    filt AS (SELECT * FROM scored WHERE L BETWEEN 50 AND 5000),
    keep AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
             FROM filt)
    SELECT doc_id, lang, source, n_chars FROM keep WHERE rn = 1
    """,
    notes="composed training-data cleaning pass: length/quality gate -> "
    "exact-dup removal keeping the lowest doc_id per fingerprint -> "
    "projected clean corpus. One window + one filter; no extra shuffles "
    "beyond the dedup key",
)
def pipeline_clean_corpus(spark, sf_dir):
    """The end-to-end shape of an LLM-data cleaning stage, composed from
    the engine's own primitives: quality gate (length bounds), exact
    near-dup collapse (md5 fingerprint, keep smallest doc_id), and final
    projection. Single keyed shuffle on the fingerprint."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", "source", "n_chars",
        F.length("text").alias("L"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    ).where(F.col("L").between(50, 5000))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


@register(
    "text_neardup_clusters",
    section="2.9",
    oracle="""
    WITH RECURSIVE
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM t),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 25),
    edges AS (SELECT id_a AS src, id_b AS dst FROM inter
              UNION ALL SELECT id_b, id_a FROM inter),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    cc(id, label) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, c.label FROM cc c JOIN edges e ON c.id = e.src
    )
    SELECT id AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
    FROM cc GROUP BY id
    """,
    notes="near-dup CLUSTERING: connected components over the >=25-common-"
    "shingle pair graph via distributed min-label propagation (bounded "
    "iterations, localCheckpoint per round); oracle = recursive-CTE "
    "transitive closure in DuckDB - a full value oracle for an iterative "
    "graph algorithm",
)
def text_neardup_clusters(spark, sf_dir):
    """Collapse near-duplicate pairs into clusters (the step between
    pair detection and keep-one-per-cluster dedup). Distributed
    min-label propagation: every node starts as its own label; each
    round, labels flow across edges and each node keeps the minimum —
    fixpoint = connected components, labelled by the smallest doc_id.
    Rounds are bounded by the component diameter (near-dup clusters are
    shallow); each round is one keyed join + aggregate, checkpointed so
    the plan does not grow with iterations."""
    pairs = text_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


LOCAL_CC_MAX_EDGES = 100_000  # below this, union-find on the driver wins


def connected_components(pairs, max_iters: int = 20, local_max: int | None = None):
    """Distributed min-label propagation over an undirected pair list
    (id_a, id_b) -> (id, label) where label is the smallest member id of
    each connected component. One keyed join + aggregate per round,
    localCheckpoint keeps the plan flat; rounds needed = component
    diameter (shallow for near-dup clusters).

    Fast path: the pair graph is the OUTPUT of an LSH + exact-re-rank
    prune, typically tiny even when the corpus is 100 TB (edges ~ number
    of true near-dup pairs). When the edge count is at most `local_max`
    (default LOCAL_CC_MAX_EDGES), label propagation's per-round
    join+shuffle round-trips dominate, so the edges are collected and a
    driver-side union-find labels them in one pass — a deliberate,
    size-bounded driver branch, NOT a scale leak: over the bound, the
    distributed path runs unchanged. Force local_max=0 to always
    distribute (tests do)."""
    if local_max is None:
        local_max = LOCAL_CC_MAX_EDGES
    pairs = pairs.localCheckpoint()
    if local_max > 0 and pairs.limit(local_max + 1).count() <= local_max:
        return _local_union_find(pairs)
    # Constraint propagation must be OFF for the checkpoint loop: a
    # checkpointed LogicalRDD keeps optimizer constraints whose
    # attribute refs can point at PRE-checkpoint columns (alias
    # chains), and the NEXT localCheckpoint's stats/constraint rewrite
    # then throws `key not found: id#N` (reproduced with any >100k-
    # edge input built through aliases; invisible at fixture scale
    # because the local union-find branch short-circuits). Pinned off
    # for the loop and restored after — the fixed-point join is on
    # checkpointed relations, so no inferred-filter value is lost.
    sess = pairs.sparkSession
    _cp_key = "spark.sql.constraintPropagation.enabled"
    _cp_prev = sess.conf.get(_cp_key, "true")
    sess.conf.set(_cp_key, "false")
    try:
        return _distributed_cc(pairs, max_iters)
    finally:
        sess.conf.set(_cp_key, _cp_prev)


def _distributed_cc(pairs, max_iters: int):
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for it in range(max_iters):
        neigh = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), "label"
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        # Pointer jumping: also adopt the label OF my label — turns the
        # per-round reach from one hop into doubling, so convergence is
        # O(log diameter) rounds instead of O(diameter). Without this, a
        # long-path component deeper than max_iters silently got wrong
        # labels (caught by the local/distributed parity test).
        jumped = (
            new_labels.alias("l1")
            .join(
                new_labels.select(
                    F.col("id").alias("jid"), F.col("label").alias("jlabel")
                ),
                F.col("l1.label") == F.col("jid"),
                "left",
            )
            .select(
                F.col("l1.id").alias("id"),
                F.least(
                    F.col("l1.label"), F.coalesce("jlabel", F.col("l1.label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    return labels


def _local_union_find(pairs):
    """Driver-side union-find over a size-bounded collected edge list;
    returns the same (id, label=min member id) schema as the distributed
    path. Path compression + union by attaching the larger root."""
    spark = pairs.sparkSession
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in pairs.collect():
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the LARGER root under the smaller so every root is
            # its component's minimum id (the output labelling contract)
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    rows = [(x, find(x)) for x in parent]
    schema = "id {t}, label {t}".format(
        t=pairs.schema.fields[0].dataType.simpleString()
    )
    return spark.createDataFrame(rows, schema)


@register(
    "join_set_similarity",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id % 3 = 0),
    d AS (SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len(toks) - 1, 1)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   AS s
          FROM t WHERE len(toks) >= 3),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.s, b.s)) AS inter,
                 len(a.s) AS na, len(b.s) AS nb
          FROM d a JOIN d b ON a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(inter * 1000000 // (na + nb - inter) AS BIGINT) AS jac_ppm
    FROM p WHERE inter * 5 >= 3 * (na + nb - inter)
    """,
    notes="EXACT near-dup join (3-gram-shingle Jaccard >= 0.6) via "
    "PREFIX FILTERING (the PPJoin family): shingles are globally "
    "ordered rarest-first, each doc's candidate prefix is its first "
    "n - ceil(0.6 n) + 1 shingles, and two docs can pass the "
    "threshold only if their prefixes share a shingle — so the join "
    "is an equi-join on prefix shingles (rare by construction, tiny "
    "buckets) followed by exact in-array verification. Unlike the "
    "MinHash path (probabilistic recall) this is LOSSLESS, and the "
    "oracle proves it: DuckDB brute-forces ALL pairs, so a hash "
    "match certifies the prefix filter dropped nothing. Threshold "
    "math is exact integers (inter*5 >= 3*union; ceil(3n/5) = "
    "(3n+4) DIV 5) — no float anywhere. Candidates scale with "
    "shingle collisions (true near-dups), never n^2 — that is the "
    "whole point vs the brute force the oracle runs; the doc subset "
    "(doc_id % 3) only bounds the ORACLE's quadratic cost",
)
def join_set_similarity(spark, sf_dir):
    from pyspark.sql import Window as W

    base = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select("doc_id", F.split("text", " ").alias("w"))
    )
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at("w", i),
            F.element_at("w", i + 1),
            F.element_at("w", i + 2),
        ),
    )
    d = (
        base.where(F.size("w") >= 3)
        .select("doc_id", F.array_distinct(sh).alias("toks"))
        # materialize the shingle table ONCE: the df build and the
        # rarity-order join both consume it, and re-evaluating the
        # interpreted shingle HOFs twice doubled the query (3.9->1.7 s)
        .localCheckpoint()
    )
    # global rarity order: token -> (df, token) rank
    freq = (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    ordered = (
        # NO broadcast hint on freq: the distinct-shingle table is
        # vocabulary-sized (corpus-scale at 100 TB), so forcing a
        # broadcast would OOM the driver exactly when it matters. AQE
        # still picks a broadcast at runtime when the table is actually
        # small (it is at every fixture SF); past the threshold this is
        # a plain shuffle join on tok, which always works.
        d.select("doc_id", F.explode("toks").alias("tok"))
        .join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda x: x["tok"],
            ).alias("s")
        )
        .select("doc_id", "s", F.size("s").alias("n"))
        # both prefix-explode sides read this relation — cut it so the
        # rarity join + collect_list aggregation runs once, not twice
        .localCheckpoint()
    )
    # prefix length n - ceil(0.6n) + 1, ceil as exact integer arithmetic
    plen = F.col("n") - ((F.lit(3) * F.col("n") + 4) / 5).cast("long") + 1
    # IDs + sizes only through the prefix-token join: carrying the full
    # shingle arrays replicates each |s|-array once per prefix token
    # across the exchange (guide §8 — decide on lightweight proxies,
    # attach the payload once). Arrays re-attach to the DEDUPED pairs
    # from the checkpointed d; array_intersect cardinality is
    # order-independent, so raw distinct arrays verify identically.
    pref = ordered.select(
        "doc_id", "n", F.explode(F.slice("s", 1, plen)).alias("ptok")
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "ptok"
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "ptok"
    )
    cand = (
        a.join(b, "ptok")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "na", "nb")
        .dropDuplicates(["doc_a", "doc_b"])
        .join(
            d.select(
                F.col("doc_id").alias("doc_a"), F.col("toks").alias("sa")
            ),
            "doc_a",
        )
        .join(
            d.select(
                F.col("doc_id").alias("doc_b"), F.col("toks").alias("sb")
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.col("na") + F.col("nb") - inter
    return (
        cand.select("doc_a", "doc_b", inter.alias("i"), union.alias("u"))
        .where(F.col("i") * 5 >= 3 * F.col("u"))
        .select(
            "doc_a",
            "doc_b",
            ((F.col("i") * 1000000) / F.col("u")).cast("long").alias("jac_ppm"),
        )
    )


@register(
    "join_set_similarity_weighted",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id % 3 = 0),
    d AS (SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len(toks) - 1, 1)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   AS s
          FROM t WHERE len(toks) >= 3),
    f AS (SELECT doc_id, unnest(s) AS tok FROM d),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM f GROUP BY tok),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM d),
    w AS (SELECT tok, (SELECT nd FROM n) * 1000 // df AS wt FROM df),
    tw AS (SELECT f.doc_id, CAST(SUM(w.wt) AS BIGINT) AS tw
           FROM f JOIN w USING (tok) GROUP BY f.doc_id),
    iw AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(SUM(w.wt) AS BIGINT) AS iw
           FROM f a JOIN f b ON a.tok = b.tok AND a.doc_id < b.doc_id
           JOIN w ON w.tok = a.tok
           GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(iw * 1000000 // (ta.tw + tb.tw - iw) AS BIGINT) AS jw_ppm
    FROM iw JOIN tw ta ON ta.doc_id = doc_a
            JOIN tw tb ON tb.doc_id = doc_b
    WHERE iw * 2 >= ta.tw + tb.tw - iw
    """,
    notes="WEIGHTED set-similarity join (idf-weighted shingle Jaccard "
    ">= 0.5) — the weighted PPJoin variant: shingle weights are exact "
    "integer milli-idf (N*1000 div df, rare shingles heavy), and each "
    "doc's candidate PREFIX is the shortest weight-descending prefix "
    "holding more than half its total weight — if every shared "
    "shingle sat in the suffix, the intersection weight would already "
    "be under theta * W(A), so a qualifying pair MUST share a prefix "
    "shingle (the asymmetric prefix-vs-postings filter, lossless by "
    "construction, no tuning knob). Candidates then verify with exact "
    "integer weight sums. The oracle brute-forces intersection "
    "weights over ALL token-sharing pairs, so the hash match "
    "certifies the weighted prefix filter dropped nothing. Weighted "
    "Jaccard is what production near-dup pipelines actually rank by "
    "— boilerplate shingles stop dominating the score",
)
def join_set_similarity_weighted(spark, sf_dir):
    from pyspark.sql import Window as W

    base = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select("doc_id", F.split("text", " ").alias("w"))
    )
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at("w", i),
            F.element_at("w", i + 1),
            F.element_at("w", i + 2),
        ),
    )
    d = (
        base.where(F.size("w") >= 3)
        .select("doc_id", F.array_distinct(sh).alias("toks"))
        .localCheckpoint()
    )
    post = d.select("doc_id", F.explode("toks").alias("tok"))
    freq = post.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    wpost = (
        # freq is vocabulary-sized — unhinted so AQE decides (broadcast
        # at fixture scale, shuffle at corpus scale); nd is ONE row and
        # keeps its hint.
        post.join(freq, "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            "df",
            F.expr("nd * 1000 div df").cast("long").alias("wt"),
        )
    )
    # canonical global order: rarest (heaviest) first, tok tiebreak
    wdoc = W.partitionBy("doc_id").orderBy("df", "tok")
    wall = W.partitionBy("doc_id")
    ranked = wpost.select(
        "doc_id",
        "tok",
        "wt",
        F.sum("wt").over(wdoc.rowsBetween(W.unboundedPreceding, 0)).alias("cumw"),
        F.sum("wt").over(wall).alias("tw"),
    )
    # minimal prefix: keep rows while the cumulative weight BEFORE them
    # has not yet passed half the doc's total (theta = 0.5, exact ints)
    pref = ranked.where(
        2 * (F.col("cumw") - F.col("wt")) <= F.col("tw")
    ).select("doc_id", "tok")
    # doc payload for exact verification: (tok, wt) structs + totals
    payload = (
        wpost.groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("tok", "wt")).alias("ws"),
            F.sum("wt").cast("long").alias("tw"),
        )
        .localCheckpoint()
    )
    # asymmetric filter: prefix tokens of one side vs FULL postings of
    # the other — provably lossless, both directions covered by the
    # unordered pair dedup
    cand = (
        pref.join(post.select(F.col("doc_id").alias("doc_o"), "tok"), "tok")
        .where(F.col("doc_id") != F.col("doc_o"))
        .select(
            F.least("doc_id", "doc_o").alias("doc_a"),
            F.greatest("doc_id", "doc_o").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # verification is O(|A| + |B|) native work per pair: array_intersect
    # (codegen) finds the shared shingles, then a short fold looks each
    # one up in A's token->weight MAP. The previous form filtered A's
    # struct array by array_contains against B — an O(|A|*|B|)
    # INTERPRETED nested HOF that dominated the query (4.9 -> 2.0 s).
    a = payload.select(
        F.col("doc_id").alias("doc_a"),
        F.map_from_entries("ws").alias("ma"),
        F.transform("ws", lambda x: x["tok"]).alias("toksa"),
        F.col("tw").alias("twa"),
    )
    b = payload.select(
        F.col("doc_id").alias("doc_b"),
        F.transform("ws", lambda x: x["tok"]).alias("toksb"),
        F.col("tw").alias("twb"),
    )
    iw = F.aggregate(
        F.array_intersect("toksa", "toksb"),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.element_at("ma", t),
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", iw.alias("iw"), (F.col("twa") + F.col("twb")).alias("tsum"))
        .where(F.col("iw") * 2 >= F.col("tsum") - F.col("iw"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("iw * 1000000 div (tsum - iw)").cast("long").alias("jw_ppm"),
        )
    )


@register(
    "text_logodds",
    section="2.9",
    oracle="""
    WITH tok AS (
      SELECT lang,
             unnest(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                                x -> x <> '')) AS token
      FROM documents),
    c AS (SELECT token,
                 CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS yi,
                 CAST(COUNT(*) FILTER (lang <> 'en') AS BIGINT) AS yj
          FROM tok GROUP BY token),
    t AS (SELECT CAST(SUM(yi) AS BIGINT) AS ni,
                 CAST(SUM(yj) AS BIGINT) AS nj FROM c),
    z AS (SELECT token, yi, yj,
                 ln((yi + yi + yj) * 1.0 / (ni + ni + nj - yi - yi - yj))
               - ln((yj + yi + yj) * 1.0 / (nj + ni + nj - yj - yi - yj))
                   AS delta,
                 1.0 / (yi + yi + yj) + 1.0 / (yj + yi + yj) AS var
          FROM c, t)
    SELECT token, yi AS en_count, yj AS other_count,
           ROUND(delta / sqrt(var), 4) AS z_score
    FROM z
    ORDER BY ROUND(delta / sqrt(var), 4) DESC, token
    LIMIT 40
    """,
    notes="the 40 most English-distinctive tokens by weighted log-odds "
    "ratio with an informative Dirichlet prior (Monroe/Colaresi/Quinn "
    "'Fightin' Words'): prior alpha_w = the token's corpus count, "
    "alpha_0 = total corpus tokens, z = delta / sqrt(1/(y_i+a_w) + "
    "1/(y_j+a_w)). All ratio inputs are exact integers with identical "
    "association on both engines; ln() is libm-variant, so z ROUNDs "
    "4 dp (the dp_histogram discipline) and BOTH engines order by the "
    "ROUNDED z with token tiebreak, making the top-40 cutoff "
    "deterministic cross-engine",
)
def text_logodds(spark, sf_dir):
    """Distinctive-vocabulary mining for corpus curation (which tokens
    mark a slice?): token counting is one map-side-combined groupBy —
    the only data-sized shuffle; the two corpus totals broadcast back,
    the z formula is per-row codegen, and the top-40 is
    TakeOrderedAndProject. Scales exactly like word count."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    c = (
        d.select(
            (F.col("lang") == "en").alias("is_en"),
            F.explode(toks).alias("token"),
        )
        .groupBy("token")
        .agg(
            F.count(F.when(F.col("is_en"), 1)).cast("long").alias("yi"),
            F.count(F.when(~F.col("is_en"), 1)).cast("long").alias("yj"),
        )
    )
    t = c.agg(
        F.sum("yi").cast("long").alias("ni"),
        F.sum("yj").cast("long").alias("nj"),
    )
    yi, yj = F.col("yi"), F.col("yj")
    ni, nj = F.col("ni"), F.col("nj")
    delta = F.log(
        (yi + yi + yj) * F.lit(1.0) / (ni + ni + nj - yi - yi - yj)
    ) - F.log((yj + yi + yj) * F.lit(1.0) / (nj + ni + nj - yj - yi - yj))
    var = F.lit(1.0) / (yi + yi + yj) + F.lit(1.0) / (yj + yi + yj)
    z = c.crossJoin(F.broadcast(t)).select(
        "token",
        yi.alias("en_count"),
        yj.alias("other_count"),
        F.round(delta / F.sqrt(var), 4).alias("z_score"),
    )
    return z.orderBy(F.desc("z_score"), "token").limit(40)


@register(
    "pipeline_langid_eval",
    section="2.9",
    oracle="""
    WITH c AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x = 'the')) AS c0,
             len(list_filter(string_split(text, ' '), x -> x = 'data')) AS c1,
             len(list_filter(string_split(text, ' '), x -> x = 'table')) AS c2,
             len(list_filter(string_split(text, ' '), x -> x = 'join')) AS c3,
             len(list_filter(string_split(text, ' '), x -> x = 'window')) AS c4
      FROM documents),
    conf AS (
      SELECT lang,
             CASE WHEN c0 > 0 AND c0 >= GREATEST(c1, c2, c3, c4) THEN 'en'
                  WHEN c1 > 0 AND c1 >= GREATEST(c2, c3, c4) THEN 'es'
                  WHEN c2 > 0 AND c2 >= GREATEST(c3, c4) THEN 'fr'
                  WHEN c3 > 0 AND c3 >= c4 THEN 'de'
                  WHEN c4 > 0 THEN 'zh'
                  ELSE 'und' END AS pred_lang
      FROM c),
    per AS (
      SELECT lang,
             CAST(COUNT(*) FILTER (pred_lang = lang) AS BIGINT) AS tp,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM conf GROUP BY lang),
    pr AS (SELECT pred_lang AS lang, CAST(COUNT(*) AS BIGINT) AS predicted
           FROM conf GROUP BY pred_lang)
    SELECT per.lang, tp, support,
           CAST(COALESCE(pr.predicted, 0) - tp AS BIGINT) AS fp,
           CAST(support - tp AS BIGINT) AS fn,
           CASE WHEN COALESCE(pr.predicted, 0) > 0
                THEN CAST(tp AS DOUBLE) / pr.predicted END AS precision_,
           CAST(tp AS DOUBLE) / support AS recall,
           CAST(2 * tp AS DOUBLE) / (COALESCE(pr.predicted, 0) + support)
             AS f1
    FROM per LEFT JOIN pr ON pr.lang = per.lang
    """,
    notes="classifier evaluation harness over the registered "
    "text_langid heuristic: per-truth-class tp/fp/fn, precision, "
    "recall, and F1 = 2tp/(predicted+support) — each metric a SINGLE "
    "division of exact integer counts (no p*r/(p+r) float chain), "
    "with a NULL guard for never-predicted classes. The pattern every "
    "model-quality gate in a data pipeline needs: predictions and "
    "truth reduce to a confusion aggregation in one pass; fixture "
    "accuracy is chance by design (shared vocab), the harness "
    "mechanics are what is exercised",
)
def pipeline_langid_eval(spark, sf_dir):
    """Evaluation as aggregation: predictions come from the registered
    classifier (one map pass), truth is a column — the confusion
    reduce is two keyed counts and a broadcast join of class-sized
    relations. At 100 TB the eval costs exactly one scan."""
    d = table(spark, sf_dir, "documents")
    conf = text_langid(spark, sf_dir).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    per = conf.groupBy("lang").agg(
        F.count(F.when(F.col("pred_lang") == F.col("lang"), 1))
        .cast("long")
        .alias("tp"),
        F.count(F.lit(1)).cast("long").alias("support"),
    )
    pr = conf.groupBy(F.col("pred_lang").alias("plang")).agg(
        F.count(F.lit(1)).cast("long").alias("predicted")
    )
    j = per.join(F.broadcast(pr), per.lang == pr.plang, "left")
    predicted = F.coalesce(F.col("predicted"), F.lit(0))
    return j.select(
        "lang",
        "tp",
        "support",
        (predicted - F.col("tp")).cast("long").alias("fp"),
        (F.col("support") - F.col("tp")).cast("long").alias("fn"),
        F.when(
            predicted > 0, F.col("tp").cast("double") / F.col("predicted")
        ).alias("precision_"),
        (F.col("tp").cast("double") / F.col("support")).alias("recall"),
        (
            (2 * F.col("tp")).cast("double")
            / (predicted + F.col("support"))
        ).alias("f1"),
    )


@register(
    "join_set_containment",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id % 3 = 0),
    d AS (SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len(toks) - 1, 1)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   AS s
          FROM t WHERE len(toks) >= 3)
    SELECT a.doc_id AS doc_in, b.doc_id AS doc_host,
           CAST(len(list_intersect(a.s, b.s)) * 1000000 // len(a.s)
                AS BIGINT) AS cont_ppm
    FROM d a JOIN d b ON a.doc_id <> b.doc_id
    WHERE len(list_intersect(a.s, b.s)) * 5 >= 4 * len(a.s)
    """,
    notes="EXACT asymmetric-containment join (|Sa inter Sb| / |Sa| >= "
    "0.8 over 3-gram shingles) — catches a small doc quoted inside a "
    "big one, which symmetric-Jaccard MinHash banding can miss "
    "because the union dilutes the score. Lossless probe-side prefix "
    "filter: shingles globally ordered rarest-first; if the overlap "
    "reaches ceil(0.8*na) then a's first na-ceil(0.8*na)+1 shingles "
    "cannot ALL be absent from b, so candidates = equi-join of a's "
    "prefix against b's FULL inverted index (containment bounds "
    "overlap by |Sa| only, so the host side cannot be prefixed — "
    "the intrinsic asymmetry of this join). A host-size prune "
    "(5*nb >= 4*na, since overlap <= nb) cuts candidates before "
    "verification. Threshold math is exact integers throughout; the "
    "oracle brute-forces ALL directed pairs, so a hash match "
    "certifies the prefix filter dropped nothing",
)
def join_set_containment(spark, sf_dir):
    """Containment self-join that scales: index side is the corpus
    inverted shingle index (corpus-linear), probe side explodes only
    rarest-first prefixes, and every candidate is verified with one
    exact in-array intersection. Cost tracks shingle collisions
    (true shared content), never n^2 — the oracle pays the quadratic
    cost instead to certify losslessness."""
    base = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select("doc_id", F.split("text", " ").alias("w"))
    )
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("w") - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at("w", i),
            F.element_at("w", i + 1),
            F.element_at("w", i + 2),
        ),
    )
    d = (
        base.where(F.size("w") >= 3)
        .select("doc_id", F.array_distinct(sh).alias("toks"))
        .localCheckpoint()  # shared by df build, ordering, and verify
    )
    freq = (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    ordered = (
        # unhinted rarity join — see join_set_similarity: the df table
        # is vocabulary-sized, AQE chooses broadcast only when small
        d.select("doc_id", F.explode("toks").alias("tok"))
        .join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda x: x["tok"],
            ).alias("s")
        )
        .select("doc_id", "s", F.size("s").alias("n"))
        # both explode sides read this relation — cut it so the
        # rarity join + collect_list aggregation runs once, not twice
        .localCheckpoint()
    )
    # probe prefix length na - ceil(0.8*na) + 1; ceil(4n/5) = (4n+4) div 5
    plen = (
        F.col("n") - ((F.lit(4) * F.col("n") + 4) / 5).cast("long") + 1
    )
    # The explode sides carry IDs + sizes ONLY: shipping the full
    # shingle arrays through the token join replicates each |s|-array
    # once per exploded token (quadratic bytes in doc length across the
    # exchange — guide §8: move decisions on lightweight proxies, then
    # attach the payload once). The arrays are re-attached to the
    # DEDUPED candidate pairs from the checkpointed d; array_intersect
    # cardinality is order-independent, so the raw distinct-shingle
    # arrays verify identically to the rarity-sorted ones.
    a = ordered.select(
        F.col("doc_id").alias("doc_in"),
        F.col("n").alias("na"),
        F.explode(F.slice("s", 1, plen)).alias("tok"),
    )
    b = ordered.select(
        F.col("doc_id").alias("doc_host"),
        F.col("n").alias("nb"),
        F.explode("s").alias("tok"),
    )
    cand = (
        a.join(b, "tok")
        .where(
            (F.col("doc_in") != F.col("doc_host"))
            & (F.col("nb") * 5 >= 4 * F.col("na"))
        )
        .select("doc_in", "doc_host", "na")
        .dropDuplicates(["doc_in", "doc_host"])
        .join(
            d.select(
                F.col("doc_id").alias("doc_in"), F.col("toks").alias("sa")
            ),
            "doc_in",
        )
        .join(
            d.select(
                F.col("doc_id").alias("doc_host"),
                F.col("toks").alias("sb"),
            ),
            "doc_host",
        )
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.select("doc_in", "doc_host", inter.alias("i"), "na")
        .where(F.col("i") * 5 >= 4 * F.col("na"))
        .select(
            "doc_in",
            "doc_host",
            ((F.col("i") * 1000000) / F.col("na"))
            .cast("long")
            .alias("cont_ppm"),
        )
    )


@register(
    "text_dup_spans",
    section="2.8",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    w AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) - 8),
                   i -> array_to_string(toks[i:i+9], ' '))) AS span
          FROM t WHERE len(toks) >= 10)
    SELECT span,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM w GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    notes="EXACT duplicated-substring mining (the rolling-window form "
    "of 'Deduplicating Training Data Makes Language Models Better'-"
    "style exact substring dedup): every 10-token window of every "
    "doc, grouped, keeping spans that appear in >= 2 distinct docs. "
    "Contiguous-window semantics (order matters, positions overlap) "
    "are exactly what shingle-SET queries like text_boilerplate "
    "cannot express. One explode + one group-by; windows are built "
    "from the MATERIALIZED token array (the r4 HOF-under-Generate "
    "lesson), not re-split per element",
)
def text_dup_spans(spark, sf_dir):
    """Cross-doc repeated-span detection in one corpus-linear pass:
    ~one window per token, map-side-combined count per span, shuffle
    keyed on the span itself. At 100 TB the same plan holds — the
    shuffle carries each distinct span once per partition thanks to
    partial aggregation; a 64-bit span fingerprint would halve
    shuffle bytes at a (documented) sliver of collision risk, kept
    as plain text here so the oracle certifies exact strings."""
    base = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 10)
    )
    wins = F.transform(
        F.sequence(F.lit(1), F.size("w") - 9),
        lambda i: F.concat_ws(" ", F.slice("w", i, 10)),
    )
    spans = base.select(
        "doc_id", F.explode(wins).alias("span")
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


@register(
    "pipeline_cohen_kappa",
    section="2.9",
    oracle="""
    WITH c AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x = 'the')) AS c0,
             len(list_filter(string_split(text, ' '), x -> x = 'data')) AS c1,
             len(list_filter(string_split(text, ' '), x -> x = 'table')) AS c2,
             len(list_filter(string_split(text, ' '), x -> x = 'join')) AS c3,
             len(list_filter(string_split(text, ' '), x -> x = 'window')) AS c4
      FROM documents),
    conf AS (
      SELECT lang,
             CASE WHEN c0 > 0 AND c0 >= GREATEST(c1, c2, c3, c4) THEN 'en'
                  WHEN c1 > 0 AND c1 >= GREATEST(c2, c3, c4) THEN 'es'
                  WHEN c2 > 0 AND c2 >= GREATEST(c3, c4) THEN 'fr'
                  WHEN c3 > 0 AND c3 >= c4 THEN 'de'
                  WHEN c4 > 0 THEN 'zh'
                  ELSE 'und' END AS pred_lang
      FROM c),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) FILTER (pred_lang = lang) AS BIGINT) AS agree
          FROM conf),
    sup AS (SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS support
            FROM conf GROUP BY lang),
    prd AS (SELECT pred_lang AS cls, CAST(COUNT(*) AS BIGINT) AS predicted
            FROM conf GROUP BY pred_lang),
    marg AS (SELECT CAST(SUM(COALESCE(support, 0) * COALESCE(predicted, 0))
                      AS BIGINT) AS src
             FROM sup FULL JOIN prd USING (cls))
    SELECT n AS n_docs, agree,
           CAST(agree AS DOUBLE) / n AS po,
           CAST(src AS DOUBLE) / (n * n) AS pe,
           FLOOR((n * agree - src) * 1e6 / (n * n - src)) / 1e6 AS kappa
    FROM t CROSS JOIN marg
    """,
    notes="Cohen's kappa between the text_langid heuristic and the "
    "labeled lang column — chance-corrected agreement, the statistic "
    "that separates a real classifier from one that parrots the "
    "majority class (accuracy alone can't). Entirely exact integers: "
    "kappa = (N*agree - sum(support_c * predicted_c)) / (N^2 - sum(...)) "
    "— the marginal product sum is an exact BIGINT (no float fold "
    "needed at all), and the statistic is ONE division, floored 6 dp. "
    "One corpus scan for the confusion, class-sized work after; the "
    "agreement-audit companion of pipeline_langid_eval's per-class "
    "precision/recall",
)
def pipeline_cohen_kappa(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    conf = text_langid(spark, sf_dir).join(
        d.select("doc_id", "lang"), "doc_id"
    ).localCheckpoint()
    t = conf.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("pred_lang") == F.col("lang"), 1))
        .cast("long")
        .alias("agree"),
    )
    sup = conf.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    prd = conf.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("predicted")
    )
    marg = (
        sup.join(prd, "cls", "full")
        .select(
            (
                F.coalesce(F.col("support"), F.lit(0))
                * F.coalesce(F.col("predicted"), F.lit(0))
            ).alias("rc")
        )
        .agg(F.sum("rc").cast("long").alias("src"))
    )
    n, agree, src = F.col("n"), F.col("agree"), F.col("src")
    return t.crossJoin(F.broadcast(marg)).select(
        n.alias("n_docs"),
        "agree",
        (agree.cast("double") / n).alias("po"),
        (src.cast("double") / (n * n)).alias("pe"),
        (F.floor((n * agree - src) * 1e6 / (n * n - src)) / 1e6).alias(
            "kappa"
        ),
    )


@register(
    "text_burstiness",
    section="2.9",
    oracle="""
    WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    tc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
    dtc AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM tc WHERE token <> '' GROUP BY doc_id, token),
    term AS (SELECT token,
                    CAST(COUNT(*) AS BIGINT) AS df,
                    CAST(SUM(c) AS BIGINT) AS s,
                    CAST(SUM(c * c) AS BIGINT) AS ss
             FROM dtc GROUP BY token),
    vmr AS (SELECT token, df, s,
                   (CAST(ss AS DOUBLE) / n_docs
                    - (CAST(s AS DOUBLE) / n_docs)
                      * (CAST(s AS DOUBLE) / n_docs))
                   / (CAST(s AS DOUBLE) / n_docs) AS b
            FROM term CROSS JOIN nd)
    SELECT token, df, s AS total_tf,
           FLOOR(b * 1e6) / 1e6 AS burstiness
    FROM vmr
    ORDER BY df DESC, token LIMIT 30
    """,
    notes="per-term burstiness (variance-to-mean ratio of the per-"
    "document count, over ALL documents including zeros — computed "
    "WITHOUT materializing the zeros: var = E[c^2] - E[c]^2 with the "
    "expectations over n_docs, so only the nonzero (doc, term) counts "
    "are ever touched). VMR ~ 1 = Poisson scatter (function words); "
    "VMR >> 1 = bursty topical terms that concentrate in few docs — "
    "the corpus-statistics complement of text_zipf_fit (frequency "
    "law) and text_tfidf (per-doc weighting). Exact BIGINT moments, "
    "identical division tree, floored 6 dp, TakeOrdered top-30 by "
    "document frequency with token tiebreak",
)
def text_burstiness(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    dtc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    term = dtc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_docs")
    b = (F.col("ss").cast("double") / F.col("n_docs") - mean * mean) / mean
    return (
        term.crossJoin(F.broadcast(nd))
        .select(
            "token",
            "df",
            F.col("s").alias("total_tf"),
            (F.floor(b * 1e6) / 1e6).alias("burstiness"),
        )
        .orderBy(F.desc("df"), "token")
        .limit(30)
    )


@register(
    "text_js_divergence",
    section="2.9",
    oracle="""
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
                 FROM documents WHERE source IN ('src0', 'src1')),
    tc AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok WHERE token <> '' GROUP BY source, token),
    w AS (SELECT token,
                 CAST(SUM(CASE WHEN source = 'src0' THEN c ELSE 0 END)
                   AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN source = 'src1' THEN c ELSE 0 END)
                   AS BIGINT) AS cb
          FROM tc GROUP BY token),
    t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb FROM w),
    terms AS (SELECT token,
                     CAST(ca AS DOUBLE) / na AS pa,
                     CAST(cb AS DOUBLE) / nb AS pb
              FROM w CROSS JOIN t),
    f AS (SELECT
            list_reduce(list_prepend(0.0,
              list(CASE WHEN pa > 0
                        THEN pa * ln(2 * pa / (pa + pb)) ELSE 0.0 END
                   ORDER BY token)), (a, b) -> a + b) AS kla,
            list_reduce(list_prepend(0.0,
              list(CASE WHEN pb > 0
                        THEN pb * ln(2 * pb / (pa + pb)) ELSE 0.0 END
                   ORDER BY token)), (a, b) -> a + b) AS klb,
            CAST(COUNT(*) AS BIGINT) AS n_terms
          FROM terms)
    SELECT n_terms, ROUND((kla + klb) / (2 * ln(2)), 4) AS jsd_bits
    FROM f
    """,
    notes="Jensen-Shannon divergence between the src0 and src1 "
    "sources' unigram distributions, in bits — the SYMMETRIC, "
    "always-finite corpus-drift measure (KL explodes on any token one "
    "side lacks; JS's mixture denominator never does). Probabilities "
    "are single divisions of exact BIGINT counts; the two KL halves "
    "fold over the VOCABULARY (bounded, not corpus-sized) in token "
    "order with 0.0 seeds; ln is libm-variant so the result ROUNDs 4 "
    "dp (the dp_histogram discipline). Next to agg_psi (binned, "
    "penalizes one-sided mass) and text_logodds (per-term z-scores) "
    "this completes the distribution-comparison toolkit",
)
def text_js_divergence(spark, sf_dir):
    d = table(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1")
    )
    tc = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = tc.groupBy("token").agg(
        F.sum(F.when(F.col("source") == "src0", F.col("c")).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("source") == "src1", F.col("c")).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    t = w.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    terms = w.crossJoin(F.broadcast(t)).select(
        "token",
        (F.col("ca").cast("double") / F.col("na")).alias("pa"),
        (F.col("cb").cast("double") / F.col("nb")).alias("pb"),
    )
    kla_t = F.when(
        F.col("pa") > 0,
        F.col("pa") * F.log(2 * F.col("pa") / (F.col("pa") + F.col("pb"))),
    ).otherwise(F.lit(0.0))
    klb_t = F.when(
        F.col("pb") > 0,
        F.col("pb") * F.log(2 * F.col("pb") / (F.col("pa") + F.col("pb"))),
    ).otherwise(F.lit(0.0))
    f = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", kla_t.alias("t")))),
            F.lit(0.0),
            lambda acc, r: acc + r["t"],
        ).alias("kla"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", klb_t.alias("t")))),
            F.lit(0.0),
            lambda acc, r: acc + r["t"],
        ).alias("klb"),
    )
    import math

    return f.select(
        "n_terms",
        F.round(
            (F.col("kla") + F.col("klb")) / (2 * math.log(2.0)), 4
        ).alias("jsd_bits"),
    )


_BD_TOP = 50  # most-frequent-terms basis (Burrows' classic 30-150 band)
_BD_Q = 1_000_000  # relative-frequency quantization (exact integer sums)


@register(
    "text_burrows_delta",
    section="2.8",
    oracle=f"""
    WITH tok AS (SELECT source,
                        unnest(list_filter(string_split(text, ' '),
                                           x -> x <> '')) AS tok
                 FROM documents),
    top AS (SELECT tok FROM (
              SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
              FROM tok GROUP BY tok
              ORDER BY c DESC, tok LIMIT {_BD_TOP})),
    tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS tot
            FROM tok GROUP BY source),
    cnt AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok JOIN top USING (tok) GROUP BY source, tok),
    grid AS (SELECT tot.source, top.tok,
                    CAST(COALESCE(cnt.c, 0) * {_BD_Q} // tot.tot
                         AS BIGINT) AS q
             FROM tot CROSS JOIN top
             LEFT JOIN cnt ON cnt.source = tot.source
                          AND cnt.tok = top.tok),
    st AS (SELECT tok,
                  CAST(COUNT(*) AS BIGINT) AS ns,
                  CAST(SUM(q) AS BIGINT) AS sq,
                  CAST(SUM(q * q) AS BIGINT) AS sqq
           FROM grid GROUP BY tok),
    z AS (SELECT g.source, g.tok,
                 CAST(ROUND((g.q - CAST(st.sq AS DOUBLE) / st.ns)
                            / SQRT(CAST(st.sqq AS DOUBLE) / st.ns
                                   - (CAST(st.sq AS DOUBLE) / st.ns)
                                     * (CAST(st.sq AS DOUBLE) / st.ns))
                            * 1e4) AS BIGINT) AS zq
          FROM grid g JOIN st USING (tok)
          WHERE st.sqq * st.ns > st.sq * st.sq),
    pair AS (SELECT a.source AS source_a, b.source AS source_b,
                    CAST(COUNT(*) AS BIGINT) AS n_terms,
                    CAST(SUM(ABS(a.zq - b.zq)) AS BIGINT) AS sd
             FROM z a JOIN z b
               ON a.tok = b.tok AND a.source < b.source
             GROUP BY 1, 2)
    SELECT source_a, source_b, n_terms,
           FLOOR(CAST(sd AS DOUBLE) / n_terms / 1e4 * 1e4) / 1e4 AS delta
    FROM pair ORDER BY source_a, source_b
    """,
    notes=f"Burrows' Delta stylometry between every pair of sources: "
    f"mean absolute difference of z-scored relative frequencies over "
    f"the corpus's top-{_BD_TOP} terms — THE authorship/style-drift "
    f"distance of computational philology, here reading on which "
    f"sources write alike. Relative frequencies quantize to exact "
    f"1e-6 integers (so the per-term mean/variance moments are exact "
    f"BIGINT sums, order-free); the z-scores are one identical "
    f"double expression over those exact moments ROUNDed at 1e-4, "
    f"and the pairwise distance is again an exact integer sum. "
    f"Zero-variance terms drop via the exact integer cross-multiply "
    f"sqq*ns > sq*sq. Corpus work = one token explode + two keyed "
    f"aggregates; the source x term grid and the pair relation are "
    f"metadata-sized at any scale",
)
def text_burrows_delta(spark, sf_dir):
    from ..core import fan_out

    d = table(spark, sf_dir, "documents")
    tok = fan_out(d.select("source", "text")).select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    # ONE corpus pass: the (source, token) count table answers every
    # downstream question (global top terms, per-source totals, grid
    # counts). Without the cut the token explode re-inlined into each
    # consumer and their consumers — the plan read the documents
    # parquet 16 times. stc is |sources| x vocabulary-sized: the
    # natural proxy relation (guide §8), checkpointed once.
    stc = (
        tok.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    top = (
        stc.groupBy("tok")
        .agg(F.sum("c").cast("long").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_BD_TOP)
        .select("tok")
    )
    tot = stc.groupBy("source").agg(
        F.sum("c").cast("long").alias("tot")
    )
    cnt = stc.join(F.broadcast(top), "tok").select("source", "tok", "c")
    grid = (
        tot.crossJoin(F.broadcast(top))
        .join(cnt, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.expr(f"coalesce(c, 0) * {_BD_Q} div tot")
            .cast("long")
            .alias("q"),
        )
    )
    st = grid.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    mu = F.col("sq").cast("double") / F.col("ns")
    var = F.col("sqq").cast("double") / F.col("ns") - mu * mu
    z = (
        grid.join(st, "tok")
        .where(F.col("sqq") * F.col("ns") > F.col("sq") * F.col("sq"))
        .select(
            "source",
            "tok",
            F.round((F.col("q") - mu) / F.sqrt(var) * 1e4)
            .cast("long")
            .alias("zq"),
        )
    )
    a = z.select(
        F.col("source").alias("source_a"), "tok", F.col("zq").alias("za")
    )
    b = z.select(
        F.col("source").alias("source_b"), "tok", F.col("zq").alias("zb")
    )
    pair = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.abs(F.col("za") - F.col("zb")))
            .cast("long")
            .alias("sd"),
        )
    )
    return pair.select(
        "source_a",
        "source_b",
        "n_terms",
        (
            F.floor(F.col("sd").cast("double") / F.col("n_terms") / 1e4 * 1e4)
            / 1e4
        ).alias("delta"),
    ).orderBy("source_a", "source_b")


@register(
    "text_hapax_ratio",
    section="2.8",
    oracle="""
    WITH tok AS (SELECT source,
                        unnest(list_filter(string_split(text, ' '),
                                           x -> x <> '')) AS tok
                 FROM documents),
    tf AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY source, tok)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS hapax,
           CAST(COUNT(*) FILTER (c = 2) AS BIGINT) AS dis,
           CAST(COUNT(*) FILTER (c = 1) * 1000000 // COUNT(*) AS BIGINT)
             AS hapax_ppm,
           CAST(COUNT(*) * 1000000 // SUM(c) AS BIGINT) AS ttr_ppm
    FROM tf GROUP BY source ORDER BY source
    """,
    notes="vocabulary-richness profile per source: hapax legomena "
    "(once-seen terms) and dis legomena (twice-seen) counts, the "
    "hapax share of the vocabulary, and the type-token ratio — the "
    "classic lexical-richness readouts (a templated/spammy source "
    "has few hapaxes and a low TTR; natural text runs ~40-60% "
    "hapaxes). Everything is exact integer counts and integer ppm "
    "divisions; the distinct-(source, term) relation is the same "
    "vocabulary-sized table every text query builds — one explode + "
    "two keyed aggregates, no floats at all. The frequency-spectrum "
    "companion to text_zipf_fit (rank curve) and text_burrows_delta "
    "(style distance)",
)
def text_hapax_ratio(spark, sf_dir):
    from ..core import fan_out

    d = table(spark, sf_dir, "documents")
    tok = fan_out(d.select("source", "text")).select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    tf = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        tf.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.when(F.col("c") == 1, 1)).cast("long").alias("hapax"),
            F.count(F.when(F.col("c") == 2, 1)).cast("long").alias("dis"),
            F.expr(
                "CAST(count(CASE WHEN c = 1 THEN 1 END) * 1000000"
                " div count(1) AS BIGINT)"
            ).alias("hapax_ppm"),
            F.expr(
                "CAST(count(1) * 1000000 div sum(c) AS BIGINT)"
            ).alias("ttr_ppm"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_tokenizer_fertility",
    section="2.9",
    oracle="""
    WITH d AS (
      SELECT lang, source,
             CAST(len(text) AS BIGINT) AS chars,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS words,
             CAST(len(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                                  x -> x <> '')) AS BIGINT) AS toks
      FROM documents)
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS sum_chars,
           CAST(SUM(words) AS BIGINT) AS sum_words,
           CAST(SUM(toks) AS BIGINT) AS sum_tokens,
           CAST(SUM(chars) * 1000 // SUM(toks) AS BIGINT)
             AS chars_per_token_milli,
           CAST(SUM(toks) * 1000 // SUM(words) AS BIGINT)
             AS tokens_per_word_milli
    FROM d GROUP BY lang, source
    ORDER BY lang, source
    """,
    notes="tokenizer fertility per (lang, source): chars-per-token and "
    "tokens-per-word in exact MILLI units (integer division of BIGINT "
    "corpus sums) under the shared BPE-ish alnum-run tokenizer — the "
    "per-language cost model every multilingual token-budget plan "
    "needs (a language with high chars/token is cheap to store, "
    "expensive to train). One corpus pass, one tiny keyed aggregate; "
    "the group relation is vocabulary-of-(lang x source)-sized at any "
    "scale",
)
def pipeline_tokenizer_fertility(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    per_doc = d.select(
        "lang",
        "source",
        F.length("text").cast("long").alias("chars"),
        F.size(words).cast("long").alias("words"),
        F.size(toks).cast("long").alias("toks"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("sum_chars"),
            F.sum("words").cast("long").alias("sum_words"),
            F.sum("toks").cast("long").alias("sum_tokens"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "sum_chars",
            "sum_words",
            "sum_tokens",
            F.expr(
                "CAST(sum_chars * 1000 div sum_tokens AS BIGINT)"
            ).alias("chars_per_token_milli"),
            F.expr(
                "CAST(sum_tokens * 1000 div sum_words AS BIGINT)"
            ).alias("tokens_per_word_milli"),
        )
        .orderBy("lang", "source")
    )


@register(
    "text_marker_dominance",
    section="2.9",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'the'))
                  AS BIGINT) AS c0,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'data'))
                  AS BIGINT) AS c1,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'table'))
                  AS BIGINT) AS c2,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'join'))
                  AS BIGINT) AS c3,
             CAST(len(list_filter(string_split(text, ' '), x -> x = 'window'))
                  AS BIGINT) AS c4
      FROM documents)
    SELECT doc_id,
           CAST(CAST(c0 > 0 AS INT) + CAST(c1 > 0 AS INT)
                + CAST(c2 > 0 AS INT) + CAST(c3 > 0 AS INT)
                + CAST(c4 > 0 AS INT) AS BIGINT) AS n_langs_present,
           CAST(c0 + c1 + c2 + c3 + c4 AS BIGINT) AS total_markers,
           CAST(GREATEST(c0, c1, c2, c3, c4) * 1000000
                // (c0 + c1 + c2 + c3 + c4) AS BIGINT)
             AS dominant_share_ppm
    FROM c WHERE c0 + c1 + c2 + c3 + c4 > 0
    ORDER BY doc_id
    """,
    notes="code-switch / language-mixedness profile per document from "
    "the text_langid marker counts: how many marker languages appear "
    "at all, and the dominant marker's share in integer ppm — the "
    "mixed-language document filter a multilingual curation pipeline "
    "runs before per-language routing (a doc whose dominant share is "
    "~1/k is marker soup, not prose in any one language). Shares are "
    "exact integer divisions of exact counts; docs with zero markers "
    "drop (no denominator). Zero-shuffle: one projection pass",
)
def text_marker_dominance(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def _cnt(marker):
        # closure, NOT a default-arg lambda: a two-arg lambda makes
        # F.filter pass (element, index) — the text_langid pitfall
        return F.size(F.filter(toks, lambda x: x == marker)).cast("long")

    counts = [
        _cnt(marker).alias(f"c{i}")
        for i, (marker, _) in enumerate(_LANG_MARKERS)
    ]
    c = d.select("doc_id", *counts)
    cs = [F.col(f"c{i}") for i in range(len(_LANG_MARKERS))]
    total = cs[0] + cs[1] + cs[2] + cs[3] + cs[4]
    present = sum(
        (ci > 0).cast("long") for ci in cs[1:]
    ) + (cs[0] > 0).cast("long")
    return (
        c.withColumn("total_markers", total.cast("long"))
        .where(F.col("total_markers") > 0)
        .select(
            "doc_id",
            present.cast("long").alias("n_langs_present"),
            "total_markers",
            F.expr(
                "CAST(greatest(c0, c1, c2, c3, c4) * 1000000"
                " div (c0 + c1 + c2 + c3 + c4) AS BIGINT)"
            ).alias("dominant_share_ppm"),
        )
        .orderBy("doc_id")
    )
