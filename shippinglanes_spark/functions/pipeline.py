"""Training-data pipeline operators (SURVEY §2.9 — LLM-data-pipeline pack).

The ops a large-scale training-data pipeline needs between "raw corpus"
and "training shards", composed from the engine's own primitives:

- `pipeline_split`: deterministic hash-based train/val/test assignment.
  Content-addressed (md5 of a salted key), so the split is stable across
  runs, machines, and engines — never `rand()`, which is neither
  reproducible nor join-stable. One narrow projection, no shuffle.
- `pipeline_pack_sequences`: sequence packing — assign documents to
  fixed-token-budget packs (the batch-construction step before LLM
  training). Deterministic running-token-count formulation: a per-shard
  window cumsum, pack = floor(exclusive_cumsum / budget). One keyed
  shuffle on the shard key; pack ids are local to a shard, so the
  window never needs a global sort.
- `dedup_embedding`: embedding-cosine near-dup dedup — exact cosine
  pair graph (broadcast block-matmul, similarity.py) -> connected
  components (distributed min-label propagation, text.py) -> keep the
  smallest vec_id per cluster. The full semantic-dedup composition;
  at 100 TB the pair stage runs behind LSH buckets (sim_ann_lsh) and
  the rest of the pipeline is unchanged.
- `etl_merge_upsert`: MERGE INTO semantics (upsert + delete) as a
  full-outer join + per-row resolution — the batch form of a CDC apply
  step. One keyed shuffle (or broadcast when the change set is small).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import money
from ..io import table
from ..registry import register


@register(
    "pipeline_split",
    section="2.9",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
                     BETWEEN '0' AND 'b' THEN 'train'
                WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
                     IN ('c', 'd') THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    notes="deterministic content-addressed train/val/test split: first md5 "
    "hex nibble of a salted key -> 12/2/2 of 16 buckets (75/12.5/12.5). "
    "Stable across runs and engines, unlike rand()",
)
def pipeline_split(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    nibble = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 1
    )
    return d.select(
        "doc_id",
        F.when(nibble.between("0", "b"), "train")
        .when(nibble.isin("c", "d"), "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "pipeline_pack_sequences",
    section="2.9",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tokens_before
      FROM t)
    SELECT doc_id, source, n_tokens,
           CAST(FLOOR(tokens_before / 2048.0) AS BIGINT) AS pack_id
    FROM c
    """,
    notes="sequence packing to a 2048-token budget: per-shard (source) "
    "exclusive running token count, pack = floor(cumsum/budget). "
    "Deterministic, one keyed shuffle, pack ids shard-local (no global sort)",
)
def pipeline_pack_sequences(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    counted = d.select(
        "doc_id", "source", F.size(toks).cast("long").alias("n_tokens")
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return counted.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(before / 2048.0).cast("long").alias("pack_id"),
    )


@register(
    "dedup_embedding",
    section="2.9",
    oracle="""
    WITH RECURSIVE
    v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
    n AS (SELECT vec_id, e,
                 SQRT(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
          FROM v),
    pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM n a JOIN n b ON a.vec_id < b.vec_id
              WHERE ROUND(list_inner_product(a.e, b.e) / (a.nrm * b.nrm), 4)
                    >= 0.3),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    cc(id, label) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, c.label FROM cc c JOIN edges e ON c.id = e.src
    ),
    labels AS (SELECT id, MIN(label) AS label FROM cc GROUP BY id)
    SELECT emb.vec_id,
           CAST(COALESCE(l.label, emb.vec_id) AS BIGINT) AS cluster_id,
           CAST(COALESCE(l.label, emb.vec_id) = emb.vec_id AS INT) AS keep
    FROM embeddings emb LEFT JOIN labels l ON emb.vec_id = l.id
    """,
    notes="embedding-cosine near-dup dedup: exact cosine pair graph "
    "(broadcast block-matmul) -> connected components (min-label "
    "propagation) -> keep the smallest vec_id per cluster; oracle = "
    "recursive-CTE transitive closure over the same ROUNDed-threshold "
    "pair set",
)
def dedup_embedding(spark, sf_dir):
    """Semantic dedup over the embedding column: vectors whose cosine
    similarity rounds to >= 0.3 are near-dups; each connected cluster
    keeps its smallest vec_id as representative (keep=1), everything
    else is dropped (keep=0). At 100 TB the exact pair stage is replaced
    by LSH-bucketed candidates (sim_ann_lsh) — the clustering and
    keep-rule stages are shape-identical."""
    from .similarity import sim_cosine_pairs
    from .text import connected_components

    emb = table(spark, sf_dir, "embeddings")
    pairs = sim_cosine_pairs(spark, sf_dir).select("id_a", "id_b")
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
    "etl_merge_upsert",
    section="2.7",
    oracle="""
    WITH changes AS (
      SELECT c_custkey AS key, 'U' AS op, c_name AS name,
             ROUND(c_acctbal + 100, 2) AS acctbal
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, 'D', c_name, c_acctbal
      FROM customer WHERE c_custkey % 10 <> 0 AND c_custkey % 7 = 3
      UNION ALL
      SELECT c_custkey + 10000000, 'I', 'NEW_' || CAST(c_custkey AS VARCHAR),
             0.0
      FROM customer WHERE c_custkey % 13 = 1
    )
    SELECT COALESCE(ch.key, b.c_custkey) AS c_custkey,
           CASE WHEN ch.op IN ('U', 'I') THEN ch.name ELSE b.c_name END AS c_name,
           ROUND(CASE WHEN ch.op IN ('U', 'I') THEN ch.acctbal
                      ELSE b.c_acctbal END, 2) AS acctbal,
           CASE WHEN ch.op = 'U' THEN 'updated'
                WHEN ch.op = 'I' THEN 'inserted'
                ELSE 'base' END AS src
    FROM customer b FULL JOIN changes ch ON b.c_custkey = ch.key
    WHERE ch.op IS NULL OR ch.op <> 'D'
    """,
    notes="MERGE INTO semantics (update/delete/insert from a CDC change "
    "set) as a full-outer join + per-row resolution; the change set here "
    "is derived deterministically from the base so both engines build the "
    "identical merge input",
)
def etl_merge_upsert(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    updates = c.where(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("key"),
        F.lit("U").alias("op"),
        F.col("c_name").alias("name"),
        money(F.col("c_acctbal") + 100).alias("acctbal"),
    )
    deletes = c.where(
        (F.col("c_custkey") % 10 != 0) & (F.col("c_custkey") % 7 == 3)
    ).select(
        F.col("c_custkey").alias("key"),
        F.lit("D").alias("op"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    inserts = c.where(F.col("c_custkey") % 13 == 1).select(
        (F.col("c_custkey") + 10000000).alias("key"),
        F.lit("I").alias("op"),
        F.concat(F.lit("NEW_"), F.col("c_custkey").cast("string")).alias("name"),
        F.lit(0.0).alias("acctbal"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    upserted = F.col("op").isin("U", "I")
    return (
        c.join(changes, c.c_custkey == changes.key, "full")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce(F.col("key"), F.col("c_custkey")).alias("c_custkey"),
            F.when(upserted, F.col("name")).otherwise(F.col("c_name")).alias(
                "c_name"
            ),
            money(
                F.when(upserted, F.col("acctbal")).otherwise(F.col("c_acctbal"))
            ).alias("acctbal"),
            F.when(F.col("op") == "U", "updated")
            .when(F.col("op") == "I", "inserted")
            .otherwise("base")
            .alias("src"),
        )
    )


@register(
    "text_vocab_topk",
    section="2.9",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'),
                                x -> x <> '')) AS token
      FROM documents),
    c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
    top AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT 500)
    SELECT token, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank,
           CAST(SUM(n) OVER (ORDER BY n DESC, token
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(total AS DOUBLE) AS coverage
    FROM top, tot
    """,
    notes="tokenizer-training prep: corpus token counts -> top-500 "
    "vocabulary with cumulative corpus coverage. Counting is a map-side-"
    "combined groupBy; top-k is TakeOrderedAndProject; only the K "
    "surviving rows pass through the (bounded, K-row) ranking window — "
    "coverage is an exact-integer cumsum divided by the exact total, so "
    "no rounding is needed",
)
def text_vocab_topk(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", "[^a-z0-9]+"), lambda x: x != "")
    counts = (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    top = counts.orderBy(F.desc("n"), "token").limit(500)
    w = Window.orderBy(F.desc("n"), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("n"), "token")).cast("long"))
        .withColumn(
            "coverage",
            F.sum("n").over(w).cast("double") / F.col("total").cast("double"),
        )
        .select("token", "n", "rank", "coverage")
    )


@register(
    "pipeline_decontaminate",
    section="2.9",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                    AS shingle
           FROM t),
    bench AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
    bsh AS (SELECT DISTINCT shingle FROM sh JOIN bench USING (doc_id)),
    hits AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bsh USING (shingle))
    SELECT d.doc_id,
           CAST(d.doc_id IN (SELECT doc_id FROM hits) AS INT) AS contaminated
    FROM documents d WHERE d.doc_id % 50 <> 0
    """,
    notes="benchmark decontamination: flag training docs sharing any "
    "3-gram with the held-out set (doc_id % 50 = 0 plays the benchmark). "
    "The benchmark's shingle set is tiny and broadcast; the corpus side "
    "is one distinct + semi-join — contamination screening never "
    "all-pairs-joins the corpus",
)
def pipeline_decontaminate(spark, sf_dir):
    """The n-gram-overlap decontamination pass every serious training
    pipeline runs before a model sees the data: any document sharing an
    n-gram with the evaluation set is flagged. Composed from the same
    shingle machinery as the dedup family; the benchmark side collapses
    to a broadcast set, so cost is one scan + one keyed distinct over
    the corpus shingles."""
    from ..core import fan_out
    from .text import shingles_of_tokens

    d = table(spark, sf_dir, "documents")
    # per-row array_distinct BEFORE exploding: the exploded stream is
    # already duplicate-free per doc, so the former corpus-wide
    # (doc_id, shingle) DISTINCT shuffle disappears entirely. Tokenize
    # in a SEPARATE select (two-step pattern, text.shingles perf note):
    # under a Generate the inlined HOF expression runs interpreted per
    # generated row, ~10x the cost.
    shs = F.array_distinct(
        F.filter(shingles_of_tokens(F.col("__toks")), lambda x: x != "")
    )
    bsh = (
        d.where(F.col("doc_id") % 50 == 0)
        .select(F.split("text", " ").alias("__toks"))
        .select(F.explode(shs).alias("shingle"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = fan_out(
        d.where(F.col("doc_id") % 50 != 0)
        .select("doc_id", F.split("text", " ").alias("__toks"))
        .select("doc_id", shs.alias("shs"))
    )
    # one map-side-combined aggregate: per-doc max(hit) collapses on the
    # map side, so the only corpus-sized shuffle carries one row per doc
    return (
        train.select("doc_id", F.explode_outer("shs").alias("shingle"))
        .join(F.broadcast(bsh), "shingle", "left")
        .groupBy("doc_id")
        .agg(F.max(F.coalesce("hit", F.lit(0))).cast("int").alias("contaminated"))
    )


@register(
    "etl_snapshot_diff",
    section="2.7",
    oracle="""
    WITH snap_old AS (
      SELECT o_orderkey AS k, o_totalprice AS price
      FROM orders WHERE o_orderkey % 10 <> 0),
    snap_new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.05
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 10 <> 3)
    SELECT COALESCE(o.k, n.k) AS o_orderkey,
           CASE WHEN o.k IS NULL THEN 'insert'
                WHEN n.k IS NULL THEN 'delete'
                ELSE 'update' END AS change,
           o.price AS old_price,
           n.price AS new_price
    FROM snap_old o FULL OUTER JOIN snap_new n ON o.k = n.k
    WHERE o.k IS NULL OR n.k IS NULL OR o.price <> n.price
    """,
    notes="snapshot diff (CDC bootstrap): two simulated table snapshots "
    "derived deterministically from orders, full-outer-joined on the key "
    "and classified insert/update/delete with unchanged rows dropped. "
    "One keyed shuffle on the join key; the 1.05 uplift is the identical "
    "IEEE multiply on both engines so update detection is exact",
)
def etl_snapshot_diff(spark, sf_dir):
    """Change-data-capture when the source has no changelog: diff two
    snapshots. Each side is a filtered scan; the full outer join is the
    single data-sized shuffle, and the classification is row-local. At
    100 TB this co-partitions both snapshots on the key (or runs
    shuffle-free if both are bucketed on it)."""
    o = table(spark, sf_dir, "orders")
    old = o.where(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("k_old"),
        F.col("o_totalprice").alias("old_price"),
    )
    new = o.where(F.col("o_orderkey") % 10 != 3).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 1.05
        )
        .otherwise(F.col("o_totalprice"))
        .alias("new_price"),
    )
    return (
        old.join(new, old.k_old == new.k_new, "full")
        .where(
            F.col("k_old").isNull()
            | F.col("k_new").isNull()
            | (F.col("old_price") != F.col("new_price"))
        )
        .select(
            F.coalesce("k_old", "k_new").alias("o_orderkey"),
            F.when(F.col("k_old").isNull(), "insert")
            .when(F.col("k_new").isNull(), "delete")
            .otherwise("update")
            .alias("change"),
            "old_price",
            "new_price",
        )
    )


@register(
    "etl_surrogate_keys",
    section="2.12",
    oracle="""
    WITH k AS (SELECT l_orderkey, l_linenumber,
                      ('0x' || substr(md5('sk:' || CAST(l_orderkey AS VARCHAR)
                                      || ':' || CAST(l_linenumber AS VARCHAR)
                                      || ':' || CAST(l_partkey AS VARCHAR)),
                                      1, 13))::BIGINT AS sk
               FROM lineitem)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT sk) AS BIGINT) AS n_keys,
           CAST(COUNT(*) - COUNT(DISTINCT sk) AS BIGINT) AS collisions,
           CAST(MIN(sk) AS BIGINT) AS min_key,
           CAST(MAX(sk) AS BIGINT) AS max_key
    FROM k
    """,
    notes="content-addressed SURROGATE-KEY minting + collision audit: "
    "52-bit keys from md5 over the salted natural key (13 hex chars — "
    "exactly the conv/hex-parse range both engines agree on), with "
    "the dedup-grade audit row every warehouse key pipeline needs "
    "(rows vs distinct keys vs collisions, key range). Unlike "
    "monotonically_increasing_id or sequences, content-addressed keys "
    "are REPRODUCIBLE across engines, reruns, and backfills — no "
    "coordination, no gaps-on-retry; at 52 bits the birthday bound "
    "keeps collision expectation ~2e-4 at a billion rows, and this "
    "query is the monitor that proves it on the actual data. "
    "Map-side-combined aggregate over one scan",
)
def etl_surrogate_keys(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    nat = F.concat(
        F.lit("sk:"),
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
        F.lit(":"),
        F.col("l_partkey").cast("string"),
    )
    sk = F.conv(F.substring(F.md5(nat), 1, 13), 16, 10).cast("long")
    k = li.select(sk.alias("sk"))
    return k.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("sk").cast("long").alias("n_keys"),
        (F.count(F.lit(1)) - F.countDistinct("sk"))
        .cast("long")
        .alias("collisions"),
        F.min("sk").cast("long").alias("min_key"),
        F.max("sk").cast("long").alias("max_key"),
    )


@register(
    "etl_cdc_apply",
    section="2.7",
    oracle="""
    WITH log_ AS (
      SELECT o_custkey AS key, CAST(o_orderkey AS BIGINT) AS seq,
             CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
             ROUND(o_totalprice, 2) AS bal
      FROM orders),
    compacted AS (
      SELECT key, seq, op, bal, version_count
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                                         ORDER BY seq DESC) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT)
                     AS version_count
            FROM log_) WHERE rn = 1)
    SELECT b.c_custkey,
           b.c_name,
           ROUND(CASE WHEN ch.op = 'U' THEN ch.bal
                 ELSE b.c_acctbal END, 2) AS acctbal,
           CASE WHEN ch.op IS NULL THEN 'unchanged' ELSE 'updated' END
             AS src,
           CAST(COALESCE(ch.version_count, 0) AS BIGINT) AS version_count,
           CAST(COALESCE(ch.seq, -1) AS BIGINT) AS last_seq
    FROM customer b LEFT JOIN compacted ch ON b.c_custkey = ch.key
    WHERE ch.op IS NULL OR ch.op <> 'D'
    """,
    notes="CDC log application with LOG COMPACTION (the Debezium-style "
    "sibling of etl_merge_upsert's single-op MERGE): a multi-version "
    "change log (one op per order, keyed by customer, sequenced by "
    "order key) compacts to the LATEST op per key — earlier versions "
    "are superseded, a trailing D tombstones the row even if earlier "
    "ops updated it — then merges into the base snapshot. The change "
    "log is derived deterministically from orders so both engines "
    "apply the identical stream; version_count audits how many "
    "superseded versions each key carried",
)
def etl_cdc_apply(spark, sf_dir):
    """The lakehouse CDC pattern at scale: compaction is one keyed
    window (latest-by-sequence per key — the same single-shuffle shape
    as dedup_keep_latest), and the apply is one key-partitioned left
    join. Neither stage depends on log length beyond the one pass, and
    replaying the same log is idempotent by construction."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    log = o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").cast("long").alias("seq"),
        F.when(F.col("o_orderkey") % 13 == 0, "D").otherwise("U").alias(
            "op"
        ),
        F.round("o_totalprice", 2).alias("bal"),
    )
    w = Window.partitionBy("key")
    compacted = (
        log.select(
            "*",
            F.row_number().over(w.orderBy(F.desc("seq"))).alias("rn"),
            F.count(F.lit(1)).over(w).cast("long").alias("version_count"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    merged = c.join(
        compacted, c.c_custkey == compacted.key, "left"
    ).where(F.col("op").isNull() | (F.col("op") != "D"))
    return merged.select(
        "c_custkey",
        "c_name",
        F.round(
            F.when(F.col("op") == "U", F.col("bal")).otherwise(
                F.col("c_acctbal")
            ),
            2,
        ).alias("acctbal"),
        F.when(F.col("op").isNull(), "unchanged")
        .otherwise("updated")
        .alias("src"),
        F.coalesce(F.col("version_count"), F.lit(0))
        .cast("long")
        .alias("version_count"),
        F.coalesce(F.col("seq"), F.lit(-1)).cast("long").alias("last_seq"),
    )


_SD_K = 8  # bounded mean cluster size; the corpus-scale dial (see SCALING.md)
_SD_ITERS = 2
_SD_DIMS = 64
_SD_THR = 0.3


def _semdedup_oracle() -> str:
    """Quantized Lloyd unroll (emb_kmeans_iters pattern) -> within-
    cluster exact-integer cosine pairs -> recursive-CTE components ->
    keep the member FARTHEST from its centroid per group."""
    ctes = [
        f"""q AS MATERIALIZED (
      SELECT e.vec_id, t.i - 1 AS dim,
             CAST(FLOOR(e.embedding[CAST(t.i AS INT)] * 1e6) AS BIGINT) AS x
      FROM embeddings e CROSS JOIN range(1, {_SD_DIMS + 1}) t(i))""",
        f"c0 AS MATERIALIZED (SELECT vec_id AS cid, dim, x AS c FROM q "
        f"WHERE vec_id < {_SD_K})",
    ]
    for i in range(1, _SD_ITERS + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
      SELECT q.vec_id, c.cid,
             CAST(SUM((q.x - c.c) * (q.x - c.c)) AS BIGINT) AS dist
      FROM q JOIN c{i - 1} c USING (dim) GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""a{i} AS MATERIALIZED (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rk
        FROM d{i}) WHERE rk = 1)"""
        )
        if i < _SD_ITERS:
            ctes.append(
                f"""c{i} AS MATERIALIZED (
      SELECT a.cid, q.dim,
             CAST(FLOOR(CAST(SUM(q.x) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS c
      FROM a{i} a JOIN q ON q.vec_id = a.vec_id GROUP BY 1, 2)"""
            )
    last = _SD_ITERS
    return (
        "WITH RECURSIVE\n    "
        + ",\n    ".join(ctes)
        + f""",
    qe AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS DOUBLE))
                    AS v
           FROM embeddings),
    nr AS (SELECT vec_id, list_inner_product(v, v) AS nn FROM qe),
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM a{last} x JOIN a{last} y
        ON x.cid = y.cid AND x.vec_id < y.vec_id
      JOIN qe ea ON ea.vec_id = x.vec_id
      JOIN qe eb ON eb.vec_id = y.vec_id
      JOIN nr na ON na.vec_id = x.vec_id
      JOIN nr nb ON nb.vec_id = y.vec_id
      WHERE ROUND(list_inner_product(ea.v, eb.v)
                  / SQRT(na.nn * nb.nn), 4) >= {_SD_THR}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    cc(id, label) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, c.label FROM cc c JOIN edges e ON c.id = e.src),
    labels AS (SELECT id, MIN(label) AS label FROM cc GROUP BY id),
    mem AS (SELECT a.vec_id, a.cid, a.dist,
                   CAST(COALESCE(l.label, a.vec_id) AS BIGINT) AS grp
            FROM a{last} a LEFT JOIN labels l ON l.id = a.vec_id),
    rk AS (SELECT vec_id, cid, grp, dist,
                  ROW_NUMBER() OVER (PARTITION BY grp
                                     ORDER BY dist DESC, vec_id) AS rn
           FROM mem)
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, grp AS group_id,
           CAST(rn = 1 AS BIGINT) AS keep
    FROM rk"""
    )


@register(
    "pipeline_semdedup",
    section="2.9",
    oracle=_semdedup_oracle(),
    notes=f"SemDeDup (Abbas et al. 2023): semantic dedup that CLUSTERS "
    f"first (k={_SD_K}, {_SD_ITERS} quantized Lloyd iterations — the "
    "emb_kmeans_iters exact-integer machinery) and only compares "
    "WITHIN clusters — the trick that makes embedding dedup tractable "
    "at corpus scale, because the pairwise stage is bounded by "
    "cluster size, never corpus^2. Within-cluster cosine uses "
    "1e-6-quantized integer dot products (every partial sum < 2^53, "
    "so list order can't change the value), groups form by connected "
    "components over the >= "
    f"{_SD_THR}-cosine pair graph, and each group keeps the member "
    "FARTHEST from its centroid (the paper's keep-low-similarity "
    "choice, favoring diversity; exact BIGINT distance, vec_id "
    "tiebreak). Fully value-oracled end to end — kmeans unrolled "
    "CTEs + recursive-CTE transitive closure",
)
def pipeline_semdedup(spark, sf_dir):
    """Registered fixture configuration of semdedup_pipeline (k, iters,
    threshold fixed so the unrolled-CTE oracle can mirror them)."""
    return semdedup_pipeline(spark, sf_dir)


def semdedup_pipeline(
    spark, sf_dir, k: int = _SD_K, iters: int = _SD_ITERS, thr: float = _SD_THR
):
    """Cluster -> within-cluster pair graph -> components -> keep
    rule. The per-dim relation drives the Lloyd iterations (broadcast
    centroids, keyed distance aggregate per round); the pair stage
    joins cluster-partitioned quantized ARRAYS (zip_with dot, no
    explode); components reuse the pointer-jumped min-label CC. At
    100 TB you raise k so clusters stay bounded — the plan shape is
    unchanged (SemDeDup's own scaling argument); scale_probe --r15-dials
    measures exactly that (k scaled with the corpus at 100x)."""
    from .text import connected_components

    emb = table(spark, sf_dir, "embeddings")
    # Quantized vectors in ARRAY form, one row per vector. The previous
    # per-dim exploded relation (64x the rows) was checkpointed and then
    # joined per Lloyd round against per-dim centroids — a 64N-row
    # materialization plus an N*k*64-row join+aggregate per round. The
    # array form computes the same exact-integer distance with a k-row
    # centroid broadcast and NO post-join aggregate (guide §2.3/§2.4:
    # shuffle fewer bytes, remove the exchange outright); the per-dim
    # relation now only materializes inside the centroid update, where
    # it is genuinely needed.
    qarr = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1e6).cast("long")
        ).alias("xq"),
    ).localCheckpoint()
    cent = qarr.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("xq").alias("cq")
    )
    # exact BIGINT squared distance: (x-c)^2 <= 4e12 per dim, *64 dims
    # <= 2.6e14 — every partial sum exact in long, same value as the
    # oracle's per-dim SUM
    sqdist = F.aggregate(
        F.zip_with("xq", "cq", lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    assign = None
    for i in range(iters):
        d = qarr.crossJoin(F.broadcast(cent)).select(
            "vec_id", "cid", sqdist.alias("dist")
        )
        # argmin via min(struct(dist, cid)): lexicographic struct order ==
        # ROW_NUMBER() OVER (ORDER BY dist, cid) rk=1, but with map-side
        # partial aggregation instead of a full window sort (guide §2.3)
        assign = (
            d.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cid")).alias("m"))
            .select(
                "vec_id", F.col("m.cid").alias("cid"), F.col("m.dist").alias("dist")
            )
        )
        if i < iters - 1:
            # centroid update keeps the exact per-dim formulation
            # (floor(sum/count) per (cid, dim), matching the oracle),
            # then reassembles the k arrays; one driver action per round
            cent = (
                assign.join(qarr, "vec_id")
                .select("cid", F.posexplode("xq").alias("dim", "x"))
                .groupBy("cid", "dim")
                .agg(
                    F.floor(F.sum("x").cast("double") / F.count(F.lit(1)))
                    .cast("long")
                    .alias("c")
                )
                .groupBy("cid")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "c"))),
                        lambda s: s["c"],
                    ).alias("cq")
                )
                .localCheckpoint()
            )
    # the last round's assignment IS read twice downstream (pair sides +
    # keep rule) and CC re-checkpoints plans built over it — pin it
    assign = assign.localCheckpoint()
    # Within-cluster pair stage as ONE grouped Arrow pass with a numpy
    # GEMM per cluster (guide §4.2: hand whole batches to vectorized
    # native code). The previous form self-joined two vector-carrying
    # sides on cid and evaluated an INTERPRETED higher-order zip_with
    # dot per candidate pair — the repo's own round-1 lesson (~100x
    # slower than block matmul) re-materialized. Exactness: quantized
    # values are <= 2e6 in magnitude, so every GEMM product (<= 4e12)
    # and every partial sum (<= 64 * 4e12 = 2.6e14 < 2^53) is an exact
    # integer in float64 regardless of summation order — numpy and the
    # zip_with fold produce bit-identical dot/norm doubles. The numpy
    # side only PRE-FILTERS with a safe margin below the threshold
    # (round-at-4dp can promote cos >= thr - 5e-5 up to thr); the
    # authoritative predicate ROUND(dot/sqrt(na*nb), 4) >= thr stays in
    # Spark SQL, bit-identical to the previous plan and the oracle.
    av = assign.join(qarr, "vec_id").select("cid", "vec_id", "xq")
    _thr = thr

    def _cluster_pairs(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "dq": pd.Series(dtype="float64"),
                "na": pd.Series(dtype="float64"),
                "nb": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        order = pdf["vec_id"].to_numpy().argsort()
        ids = pdf["vec_id"].to_numpy()[order]
        M = np.vstack(pdf["xq"].to_numpy()[order]).astype(np.float64)
        G = M @ M.T
        nn = np.einsum("ij,ij->i", M, M)
        iu, ju = np.triu_indices(len(ids), k=1)
        dq = G[iu, ju]
        na, nb = nn[iu], nn[ju]
        keep = dq / np.sqrt(na * nb) >= _thr - 1e-4  # safe pre-filter only
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "dq": dq[keep],
                "na": na[keep],
                "nb": nb[keep],
            }
        )

    cand = av.groupBy("cid").applyInPandas(
        _cluster_pairs, schema="id_a long, id_b long, dq double, na double, nb double"
    )
    pairs = (
        cand.where(
            F.round(F.col("dq") / F.sqrt(F.col("na") * F.col("nb")), 4) >= thr
        )
        .select("id_a", "id_b")
        # pin the pair set: CC's distributed branch re-checkpoints its
        # frontier, and checkpointing a plan that self-joins the SAME
        # checkpointed assign relation trips Spark's constraint rewrite
        # (key not found: id#...) — a clean LogicalRDD start avoids it
        .localCheckpoint()
    )
    labels = connected_components(pairs)
    mem = assign.join(labels, assign.vec_id == labels.id, "left").select(
        "vec_id",
        "cid",
        "dist",
        F.coalesce(F.col("label"), F.col("vec_id")).cast("long").alias("grp"),
    )
    rn = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.desc("dist"), "vec_id")
    )
    return mem.withColumn("rn", rn).select(
        "vec_id",
        F.col("cid").cast("long").alias("cluster_id"),
        F.col("grp").alias("group_id"),
        (F.col("rn") == 1).cast("long").alias("keep"),
    )
