"""Independent semantic cross-checks for the round-5 session-4 batch 1
(asymmetric containment join, duplicated-span mining)."""

from __future__ import annotations

from collections import Counter, defaultdict

from shippinglanes_spark.registry import all_queries


def _shingle_sets(texts):
    out = {}
    for doc_id, text in texts:
        toks = text.split(" ")
        if len(toks) < 3:
            continue
        out[doc_id] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    return out


def test_containment_join_matches_bruteforce(spark, sf_dir):
    """The prefix-filtered join must equal ALL-directed-pairs brute
    force — losslessness is the whole claim."""
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    sets = _shingle_sets(
        (r.doc_id, r.text) for r in rows if r.doc_id % 3 == 0
    )
    expect = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if inter * 5 >= 4 * len(sa):
                expect[(a, b)] = inter * 1_000_000 // len(sa)
    out = all_queries()["join_set_containment"].fn(spark, sf_dir).collect()
    got = {(r.doc_in, r.doc_host): r.cont_ppm for r in out}
    assert got == expect
    assert len(got) > 0  # fixture must exercise the operator


def test_containment_score_is_directional(spark, sf_dir):
    """The fixture's planted near-dups pass in BOTH directions, but
    their shingle-set sizes differ, so cont_ppm must differ across
    directions for at least one pair — the score normalizes by |Sa|,
    not the union."""
    out = all_queries()["join_set_containment"].fn(spark, sf_dir).collect()
    ppm = {(r.doc_in, r.doc_host): r.cont_ppm for r in out}
    assert any(
        (b, a) in ppm and ppm[(b, a)] != v for (a, b), v in ppm.items()
    )


def test_containment_one_way_pair(spark, tmp_path):
    """A short doc quoted verbatim inside a long one must match
    small->big only: containment 1.0 one way, diluted below 0.8 the
    other. Built on a synthetic documents.parquet because the fixture
    corpus has only mutual near-dups."""
    small = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    filler = " ".join(f"w{i}" for i in range(60))
    rows = [
        (0, small),
        (3, small + " " + filler),
        (6, "zulu yankee xray whiskey victor uniform tango sierra"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        all_queries()["join_set_containment"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    got = {(r.doc_in, r.doc_host): r.cont_ppm for r in out}
    assert got == {(0, 3): 1_000_000}


def test_dup_spans_match_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    occ = Counter()
    docs = defaultdict(set)
    first = {}
    for r in rows:
        toks = r.text.split(" ")
        for i in range(len(toks) - 9):
            span = " ".join(toks[i : i + 10])
            occ[span] += 1
            docs[span].add(r.doc_id)
            first[span] = min(first.get(span, r.doc_id), r.doc_id)
    expect = {
        s: (len(docs[s]), occ[s], first[s])
        for s in occ
        if len(docs[s]) >= 2
    }
    out = all_queries()["text_dup_spans"].fn(spark, sf_dir).collect()
    got = {r.span: (r.n_docs, r.n_occ, r.first_doc) for r in out}
    assert got == expect
    assert len(got) > 0


def test_dup_spans_counts_positions_not_docs(spark, tmp_path):
    """n_occ counts window POSITIONS: a doc repeating the same
    10-gram twice contributes 2 occurrences but 1 distinct doc.
    Synthetic corpus because the fixture has no within-doc repeats."""
    ten = " ".join(f"t{i}" for i in range(10))
    rows = [
        (0, ten + " sep " + ten),  # the 10-gram appears twice in doc 0
        (1, ten),
        (2, " ".join(f"u{i}" for i in range(12))),
    ]
    spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = (
        all_queries()["text_dup_spans"].fn(spark, str(tmp_path)).collect()
    )
    got = {r.span: (r.n_docs, r.n_occ, r.first_doc) for r in out}
    assert got == {ten: (2, 3, 0)}
