"""SURVEY §2.9 — sketch-based near-duplicate detection.

Three sketches, all pure DataFrame + built-in hash functions (JVM-side,
no Python in the per-row path):

- MinHash + LSH banding: shingle -> per-seed min-hash signature -> band
  hashes -> bucket self-join -> candidate pairs. The shuffle is on band
  hash, so cost scales with bucket collisions, not n² — the standard
  100 TB dedup shape. Candidates would feed text_ngram_jaccard's exact
  re-rank.
- SimHash: 64-bit signature from per-token hash bit votes; hamming
  distance via xor+bit_count gives O(1) near-dup tests.
- Random-hyperplane LSH over embeddings: sign-bit signature buckets,
  exact cosine re-rank inside buckets only.

No DuckDB oracles (engine-specific hash functions); planted-duplicate
recall is asserted in tests/test_dedup.py.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..core import fan_out
from ..io import table
from ..registry import register

N_HASHES = 32
N_BANDS = 8  # 4 rows per band


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, h0..h{N-1}) min-hash signature per document.

    No shingle-dedup pass: min() over repeated shingles equals min()
    over the distinct set, so the signature is set-semantics-exact
    without paying a distinct's extra shuffle. fan_out lifts the
    explode off a single-split source (see core.fan_out).

    Deliberately the explode + 32-way min AGGREGATE, not a per-row
    array_min(transform(...)) map: higher-order functions evaluate
    interpreted and the collapsed projection re-inlines the shingle
    expression into every transform, so the map form measures 5x SLOWER
    here (0.70 s -> 3.70 s at sf0.1). The map form only wins when the
    shingle array is already materialized by a checkpoint — see
    containment_lsh_candidates."""
    # two-step tokenize-then-shingle: explode over the inlined HOF
    # expression evaluates it interpreted per generated row (~10x cost,
    # see text.shingles perf note)
    from .text import shingles_of_tokens

    sh = (
        fan_out(docs.select(id_col, text_col))
        .select(id_col, F.split(F.col(text_col), " ").alias("__toks"))
        .select(
            id_col,
            F.explode(shingles_of_tokens(F.col("__toks"))).alias("shingle"),
        )
        .where(F.col("shingle") != "")
    )
    mins = [
        F.min(F.hash("shingle", F.lit(seed))).alias(f"h{seed}")
        for seed in range(N_HASHES)
    ]
    return sh.groupBy(id_col).agg(*mins)


MAX_BUCKET = 1000  # in-bucket all-pairs cap (quadratic-expansion guard)


def minhash_candidates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding (distinct id pairs).

    Single-pass formulation: one groupBy on (band, band-hash) collects
    each bucket's ids and emits the in-bucket pairs with a higher-order
    transform — the signature pipeline (shingle explode + 32-way min
    aggregation, the expensive part) is computed ONCE. The equivalent
    band self-join evaluates it twice: the broadcast side's subtree
    differs from the probe side's, so Catalyst cannot reuse the exchange.

    Over-cap buckets are NOT dropped (no silent recall holes — the
    refinement idea of embedding_neardups below, extended with
    representative linking): a bucket over MAX_BUCKET is sub-bucketed on
    a hash of the FULL 32-value signature, then

    - each sub-bucket emits LINEAR anchor pairs (first member vs the
      rest): a boilerplate cluster of identical documents shares the
      whole signature, so it collapses into one sub-bucket and costs
      O(n) pairs instead of O(n^2), while every member stays reachable
      through the anchor — all a downstream connected-components dedup
      needs;
    - the sub-bucket REPRESSENTATIVES (first member of each, including
      singleton sub-buckets) pair with each other — all-pairs when the
      representative set fits MAX_BUCKET, linear anchor chain past that
      — so a near-duplicate whose signature differs slightly from the
      giant cluster's (own sub-bucket) still reaches it through the
      representative link. Candidates are a superset by design; the
      exact re-rank (text_ngram_jaccard) discards false positives."""
    sig = minhash_signatures(docs, text_col, id_col)
    rows_per_band = N_HASHES // N_BANDS
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bh"),
        )
        for b in range(N_BANDS)
    ]
    full_sig_hash = F.hash(*[F.col(f"h{i}") for i in range(N_HASHES)])
    exploded = sig.select(
        F.col(id_col),
        full_sig_hash.alias("sigh"),
        F.explode(F.array(*bands)).alias("bb"),
    ).select(
        id_col, "sigh", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    # the window shuffles on (band, bh); both groupBys' clusterings are
    # satisfied by that partitioning, so ONE exchange covers the window
    # and the two-level collect — the signature pipeline runs once
    cnt = F.count(F.lit(1)).over(W.partitionBy("band", "bh"))
    sub = exploded.withColumn(
        "subkey", F.when(cnt > MAX_BUCKET, F.col("sigh")).otherwise(F.lit(-1))
    )
    buckets = (
        sub.groupBy("band", "bh", "subkey")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .groupBy("band", "bh")
        .agg(F.collect_list(F.struct("subkey", "ids")).alias("subs"))
    )

    def all_pairs(ids):
        return F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + 2, F.size(ids)),
                    lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                ),
            )
        )

    def anchor_pairs(ids):
        return F.transform(
            F.slice(ids, 2, F.size(ids)),
            lambda y: F.struct(F.element_at(ids, 1).alias("id_a"), y.alias("id_b")),
        )

    # a bucket's rows all share one subkey condition: either the single
    # subkey=-1 entry (normal bucket, guaranteed <= MAX_BUCKET members)
    # or a set of full-signature sub-buckets (hot bucket)
    is_normal = (F.size("subs") == 1) & (F.col("subs")[0]["subkey"] == -1)
    normal_pairs = all_pairs(F.col("subs")[0]["ids"])
    member_pairs = F.flatten(
        F.transform("subs", lambda s: anchor_pairs(s["ids"]))
    )
    reps = F.array_sort(F.transform("subs", lambda s: F.element_at(s["ids"], 1)))
    rep_pairs = F.when(F.size(reps) <= MAX_BUCKET, all_pairs(reps)).otherwise(
        anchor_pairs(reps)
    )
    pairs = F.when(is_normal, normal_pairs).otherwise(
        F.concat(member_pairs, rep_pairs)
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


@register(
    "text_minhash_dedup",
    section="2.9",
    oracle=None,
    notes="MinHash-LSH candidate pairs; fixtures have no near-dups (0 rows) — "
    "planted-pair recall asserted in tests/test_dedup.py",
)
def text_minhash_dedup(spark, sf_dir):
    return minhash_candidates(table(spark, sf_dir, "documents"))


_SIMHASH_BITS = 60  # 15 md5 hex chars -> < 2^60, sign-safe in BIGINT


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash bigint): 60-bit SimHash over whitespace tokens.

    The per-token hash is the content-addressed 60-bit md5 prefix (not
    xxhash64) so the ENTIRE signature is engine-reproducible — DuckDB
    computes the identical value, which upgrades text_simhash from
    rows-only to a full value oracle. 60 bits (15 hex chars) keep the
    parse inside signed-BIGINT range on both engines."""
    tok = fan_out(docs.select(id_col, text_col)).select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.col("token") != "")
    h = F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(_SIMHASH_BITS)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    sim = reduce(
        lambda acc, i: acc.bitwiseOR(
            F.when(
                F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        ),
        range(_SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    return voted.select(F.col(id_col), sim.alias("simhash"))


@register(
    "text_simhash",
    section="2.9",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
      FROM documents),
    h AS (SELECT doc_id,
                 ('0x' || substr(md5(token), 1, 15))::BIGINT AS hv
          FROM tok),
    votes AS (
      SELECT doc_id, t.i AS bit,
             CAST(SUM(CASE WHEN (hv >> CAST(t.i AS INT)) & 1 = 1
                      THEN 1 ELSE -1 END) AS BIGINT) AS v
      FROM h CROSS JOIN range(0, {_SIMHASH_BITS}) t(i)
      GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0
                    THEN (1::BIGINT << CAST(bit AS INT)) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
    notes=f"{_SIMHASH_BITS}-bit SimHash per document over the content-"
    "addressed md5 token hash — every signature bit is an exact "
    "integer vote, so the full signature value-checks cross-engine "
    "(formerly rows-only under xxhash64, which only Spark can "
    "compute). Spark folds the per-bit votes into one wide "
    "map-side-combined aggregate (one pass, no per-bit shuffle); the "
    "oracle's bit-explode shape is the same computation transposed. "
    "Hamming-neighbor separation asserted in tests/test_dedup.py",
)
def text_simhash(spark, sf_dir):
    return simhash64(table(spark, sf_dir, "documents"))


N_PLANES = 16
N_SUBPLANES = 8  # hot-bucket refinement bits (2^8 sub-buckets)
COS_THRESHOLD = 0.95


def embedding_neardups(spark, emb: DataFrame) -> DataFrame:
    """Near-duplicate vector pairs: random-hyperplane LSH bucket join,
    exact cosine re-rank inside buckets (cos >= COS_THRESHOLD)."""
    import numpy as np

    rng = np.random.RandomState(42)
    planes = rng.randn(N_PLANES, 64)
    extra = rng.randn(N_SUBPLANES, 64)  # refinement planes for hot buckets
    b_planes = spark.sparkContext.broadcast((planes, extra))

    def signature(batches):
        pl, xpl = b_planes.value
        for pdf in batches:
            q = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            bits = (q @ pl.T) > 0
            sig = (bits * (1 << np.arange(N_PLANES))).sum(axis=1).astype(np.int64)
            xbits = (q @ xpl.T) > 0
            sig2 = (xbits * (1 << np.arange(N_SUBPLANES))).sum(axis=1).astype(
                np.int64
            )
            nrm = np.linalg.norm(q, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "sig": sig,
                    "sig2": sig2,
                    "embedding": pdf["embedding"],
                    "nrm": nrm,
                }
            )

    sigs = emb.select("vec_id", "embedding").mapInPandas(
        signature,
        schema="vec_id long, sig long, sig2 long, embedding array<float>, nrm double",
    )
    # Bucket-collect instead of a sig self-join: the self-join's broadcast
    # side is a different subtree, so Catalyst re-evaluates the mapInPandas
    # signature pass twice (same pitfall as minhash_candidates). One
    # groupBy(sig) computes it once; in-bucket pairs expand with a
    # higher-order transform.
    #
    # Over-cap buckets are NOT dropped (no silent caps): a bucket over
    # MAX_BUCKET is sub-bucketed on N_SUBPLANES extra hyperplane bits
    # (true near-dups at cos>=0.95 still collide on the refinement bits
    # w.h.p.), and a sub-bucket that is STILL over cap — vectors so
    # similar that 2^N_SUBPLANES refinement can't split them — emits
    # linear anchor pairs (first member vs the rest) instead of the
    # quadratic all-pairs: every member still connects to the group
    # through the anchor, which is exactly what a downstream dedup
    # connected-components pass needs, at O(n) pairs instead of O(n^2).
    cnt = F.count(F.lit(1)).over(W.partitionBy("sig"))
    sub = sigs.withColumn(
        "subkey", F.when(cnt > MAX_BUCKET, F.col("sig2")).otherwise(F.lit(-1))
    )
    buckets = (
        sub.groupBy("sig", "subkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("vec_id", "embedding", "nrm"))
            ).alias("vs")
        )
        .where(F.size("vs") >= 2)
    )
    all_pairs = F.flatten(
        F.transform(
            "vs",
            lambda x, i: F.transform(
                F.slice(F.col("vs"), i + 2, F.size("vs")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    anchor_pairs = F.transform(
        F.slice(F.col("vs"), 2, F.size("vs")),
        lambda y: F.struct(F.element_at(F.col("vs"), 1).alias("a"), y.alias("b")),
    )
    pairs = F.when(F.size("vs") <= MAX_BUCKET, all_pairs).otherwise(anchor_pairs)
    dot = F.aggregate(
        F.zip_with(
            F.col("p.a.embedding"),
            F.col("p.b.embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.a.vec_id").alias("id_a"),
            F.col("p.b.vec_id").alias("id_b"),
            F.round(dot / (F.col("p.a.nrm") * F.col("p.b.nrm")), 4).alias("cos"),
        )
        .where(F.col("cos") >= COS_THRESHOLD)
    )


@register(
    "sim_ann_lsh",
    section="2.9",
    oracle=None,
    notes="hyperplane-LSH near-dup vectors; fixtures have none (0 rows) — "
    "planted-pair recall asserted in tests/test_dedup.py",
)
def sim_ann_lsh(spark, sf_dir):
    return embedding_neardups(spark, table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Containment search over LSH candidates (LSH Ensemble, Zhu et al. VLDB'16)
# ---------------------------------------------------------------------------

_CONT_MAX_GAP = 6  # probe up to 2^(6+1) = 128x-larger host strata
_CONT_R1_BANDS = N_HASHES  # r=1: every signature value is its own band
_CONT_R2_BANDS = N_HASHES // 2


def containment_lsh_candidates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Asymmetric-containment pairs (|Sa∩Sb|/|Sa| >= 0.8) generated
    through SIZE-STRATIFIED MinHash-LSH — the LSH Ensemble design — and
    verified exactly.

    Why stratify: MinHash banding collides on symmetric JACCARD, and a
    small document fully quoted inside one x times larger has Jaccard
    only ~theta/(1+x) — it evades any banding tuned for near-dup
    Jaccard. But the Jaccard a qualifying pair CAN'T go below is a
    function of the two set sizes: J >= theta*na/(na + nb - theta*na).
    So hosts are partitioned into power-of-two size strata, and each
    probe chooses its banding PER HOST STRATUM from that exact-integer
    bound — r=2 (16 bands, LSH threshold 0.25) while 3*na >= 2^(j+1),
    r=1 (32 bands, threshold 1/32) for larger hosts, out to a
    2^{MAX_GAP}x size gap (past that the implied Jaccard is so low
    that sketch-based candidates are hopeless by construction — the
    documented horizon of the method; join_set_containment's lossless
    inverted index is the fallback when that tail matters).

    Candidates verify with one exact in-array intersection, so every
    reported pair is a TRUE containment pair; only recall is
    probabilistic (planted-pair floors in tests/test_dedup.py). Hot
    host buckets collapse identical-signature members to one
    representative (the boilerplate-giant valve, as in
    minhash_candidates) instead of dropping anyone.

    Scale shape: keys per document are bounded (48 host keys, <=
    strata x 32 probe keys); the join shuffles on (stratum, r, band,
    bandhash) so cost tracks true sketch collisions, never n^2.
    """
    from .text import shingles_of_tokens

    base = (
        fan_out(docs.select(id_col, text_col))
        .select(id_col, F.split(F.col(text_col), " ").alias("__toks"))
        .select(
            id_col,
            F.array_distinct(
                F.filter(
                    shingles_of_tokens(F.col("__toks")), lambda s: s != ""
                )
            ).alias("s"),
        )
        .where(F.size("s") >= 1)
        .select(id_col, "s", F.size("s").alias("n"))
        .localCheckpoint()  # reused by signatures AND exact verification
    )
    # Signature as per-row array_min(transform(...)) MAP work over the
    # checkpointed shingle array — the former explode + 32-way min
    # aggregation shuffled every (id, shingle) row for the same values
    # (hash(x, seed) is the same two-arg hash the aggregate computed;
    # measured 1.59 s -> 0.22 s at sf0.1, rows bit-identical). Only
    # valid BECAUSE `s` comes from the checkpoint: on an unmaterialized
    # pipeline the collapsed projection re-inlines the shingle HOF into
    # all 32 transforms and the map form is 5x slower — see
    # minhash_signatures, which keeps the aggregate for that reason.
    minexprs = [
        F.expr(f"array_min(transform(s, x -> hash(x, {seed})))").alias(
            f"h{seed}"
        )
        for seed in range(N_HASHES)
    ]
    sig = base.select(
        id_col,
        "n",
        *minexprs,
        F.expr("cast(floor(log2(cast(n as double))) as int)").alias("st"),
    ).localCheckpoint()  # feeds probe AND host key emission
    # one-row stratum ceiling: probes never emit keys for strata no
    # host occupies (a probe-row-count valve, not a correctness gate)
    max_st = sig.agg(F.max("st").alias("max_st"))

    key_t = "array<struct<j:int,r:int,b:int,bh:int>>"

    # key arrays are built as SQL text (one F.expr each): composing
    # ~1500 struct/hash Column objects through the Python API costs
    # seconds of py4j round-trips per call; the SQL string is one call
    def _r2_keys(j_sql: str) -> str:
        return (
            "array("
            + ", ".join(
                f"struct(cast({j_sql} as int) as j, 2 as r, {b} as b,"
                f" hash(h{2 * b}, h{2 * b + 1}) as bh)"
                for b in range(_CONT_R2_BANDS)
            )
            + ")"
        )

    def _r1_keys(j_sql: str) -> str:
        return (
            "array("
            + ", ".join(
                f"struct(cast({j_sql} as int) as j, 1 as r, {b} as b,"
                f" hash(h{b}) as bh)"
                for b in range(_CONT_R1_BANDS)
            )
            + ")"
        )

    # probe side: per admissible host stratum j, the banding implied by
    # the exact-integer Jaccard floor. Admissible: the stratum can hold
    # a host of size >= 0.8*na, i.e. 5*2^(j+1) > 4*na. r=2 while
    # 3*na >= 2^(j+1) (J_min >= 0.25), else r=1.
    gap_arrays = []
    for g in range(-1, _CONT_MAX_GAP + 1):
        top = f"shiftleft(cast(1 as bigint), st + {g} + 1)"
        adm = f"5 * {top} > 4 * n AND st + {g} >= 0 AND st + {g} <= max_st"
        gap_arrays.append(
            f"CASE WHEN {adm} AND 3 * n >= {top}"
            f" THEN {_r2_keys(f'st + {g}')}"
            f" WHEN {adm} THEN {_r1_keys(f'st + {g}')}"
            f" ELSE cast(array() as {key_t}) END"
        )
    probe = (
        sig.crossJoin(F.broadcast(max_st))
        .select(
            F.col(id_col).alias("doc_in"),
            F.col("n").alias("na"),
            F.explode(
                F.expr("concat(" + ", ".join(gap_arrays) + ")")
            ).alias("k"),
        )
        .select("doc_in", "na", "k.j", "k.r", "k.b", "k.bh")
    )

    # host side: index into OWN stratum under both band widths. One
    # bucket-collect groupBy (single shuffle) replaces window passes;
    # hot buckets collapse identical-signature members to one
    # representative (the boilerplate-giant valve) instead of dropping
    # anyone.
    full_sig_hash = F.expr(
        "hash(" + ", ".join(f"h{i}" for i in range(N_HASHES)) + ")"
    )
    hostk = sig.select(
        F.col(id_col).alias("doc_host"),
        F.col("n").alias("nb"),
        full_sig_hash.alias("sigh"),
        F.explode(
            F.expr(f"concat({_r2_keys('st')}, {_r1_keys('st')})")
        ).alias("k"),
    ).select("doc_host", "nb", "sigh", "k.j", "k.r", "k.b", "k.bh")
    buckets = hostk.groupBy("j", "r", "b", "bh").agg(
        F.array_sort(
            F.collect_list(F.struct("sigh", "doc_host", "nb"))
        ).alias("hs")
    )
    # Explicit when/otherwise rather than `(i == 0) | ...`: under Spark 4's
    # ANSI mode element_at(array, 0) raises, so the i==0 branch must never
    # evaluate the element_at — don't rely on Or short-circuit semantics.
    dedup_by_sig = F.filter(
        F.col("hs"),
        lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
            x["sigh"] != F.element_at(F.col("hs"), i)["sigh"]
        ),
    )
    members = F.when(F.size("hs") <= MAX_BUCKET, F.col("hs")).otherwise(
        dedup_by_sig
    )
    host = buckets.select(
        "j", "r", "b", "bh", F.explode(members).alias("m")
    ).select("j", "r", "b", "bh", "m.doc_host", "m.nb")

    cand = (
        probe.join(host, ["j", "r", "b", "bh"])
        .where(
            (F.col("doc_in") != F.col("doc_host"))
            & (F.lit(5) * F.col("nb") >= F.lit(4) * F.col("na"))
        )
        .select("doc_in", "doc_host")
        .distinct()
    )
    # exact verification: one in-array intersection per candidate
    a = base.select(
        F.col(id_col).alias("doc_in"), F.col("s").alias("sa"), F.col("n").alias("na")
    )
    b = base.select(
        F.col(id_col).alias("doc_host"), F.col("s").alias("sb")
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.join(a, "doc_in")
        .join(b, "doc_host")
        .select("doc_in", "doc_host", inter.alias("i"), "na")
        .where(F.col("i") * 5 >= 4 * F.col("na"))
        .select(
            "doc_in",
            "doc_host",
            F.expr("i * 1000000 div na").cast("long").alias("cont_ppm"),
        )
    )


@register(
    "join_containment_lsh",
    section="2.9",
    oracle=None,
    notes="size-stratified LSH containment candidates (LSH Ensemble), "
    "exact-verified; recall floors (planted slices at 2/4/8x size "
    "ratios + agreement vs the lossless inverted-index join) in "
    "tests/test_dedup.py. Same doc_id %% 3 slice as "
    "join_set_containment so the two containment paths are directly "
    "comparable on the same corpus",
)
def join_containment_lsh(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0)
    return containment_lsh_candidates(docs)
