"""Independent semantic cross-checks for the round-5 session-3 batch 7
(interval coalescing, langid evaluation harness)."""

from __future__ import annotations

import pandas as pd

from shippinglanes_spark.registry import all_queries


def test_interval_merge_matches_python_sweep(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS s",
            "value",
        )
        .toPandas()
    )
    ev = ev[ev["value"].notna()].copy()
    ev["e"] = ev["s"] + (
        1 + (ev["value"] * 100).round().astype("int64") % 3600
    ) * 1_000_000
    expect = {}
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["s", "event_id"])
        island = 0
        max_e = None
        cur = None
        for _, r in grp.iterrows():
            if max_e is None or r["s"] > max_e:
                if cur:
                    expect[(uid, island)] = tuple(cur)
                island += 1
                cur = [int(r["s"]), int(r["e"]), 1]
                max_e = int(r["e"])
            else:
                cur[1] = max(cur[1], int(r["e"]))
                cur[2] += 1
                max_e = max(max_e, int(r["e"]))
        if cur:
            expect[(uid, island)] = tuple(cur)
    out = all_queries()["evt_interval_merge"].fn(spark, sf_dir).collect()
    got = {
        (r.user_id, r.island): (r.span_start_us, r.span_end_us, r.n_intervals)
        for r in out
    }
    assert got == expect
    # islands truly merge by OVERLAP, not fixed gaps: some island must
    # span multiple intervals
    assert any(n > 1 for _, _, n in got.values())
    # islands are disjoint and ordered per user
    for uid in {u for u, _ in got}:
        spans = sorted(v[:2] for (u, _), v in got.items() if u == uid)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1


def test_langid_eval_consistency(spark, sf_dir):
    pred = (
        all_queries()["text_langid"].fn(spark, sf_dir).toPandas()
    )
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .toPandas()
    )
    m = pred.merge(d, on="doc_id")
    out = all_queries()["pipeline_langid_eval"].fn(spark, sf_dir).collect()
    got = {r.lang: r for r in out}
    assert set(got) == set(m["lang"].unique())
    for lang, r in got.items():
        sub = m[m["lang"] == lang]
        tp = int((sub["pred_lang"] == lang).sum())
        predicted = int((m["pred_lang"] == lang).sum())
        assert r.tp == tp
        assert r.support == len(sub)
        assert r.fp == predicted - tp
        assert r.fn == len(sub) - tp
        if predicted > 0:
            assert r.precision_ == tp / predicted
        else:
            assert r.precision_ is None
        assert r.recall == tp / len(sub)
        assert r.f1 == 2 * tp / (predicted + len(sub))
