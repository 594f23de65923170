"""Row-VALUE degeneracy audit (VERDICT r6 item 7).

Round 6 caught two queries whose outputs were hash-green yet said
nothing — the all-channels Shapley coalition and the LPA
single-community collapse — both found by VALUE inspection, not the
oracle hash (a degenerate answer is still deterministic, so it
hash-matches an equally degenerate oracle). This file systematizes that
audit: every declared query whose output COULD collapse to a constant
(communities, coalitions, geofence zones on the synthetic lon = 2*lat
line, quantile scores, split assignments, saturating-graph analytics)
gets a minimum-diversity contract that a planted degenerate variant
would fail.

Round-8 extension (VERDICT r7 item 7): FULL-registry coverage. Every
declared query is now under either a targeted DIVERSITY contract (58),
a reasoned UNIVERSAL_EXEMPT entry (8, each verified non-degenerate at
a higher SF), or the universal no-collapse floor (everything else:
non-empty, and multi-row frames must not be constant). New-query
checklist (STATE.md): at registration time, add a DIVERSITY entry or
confirm the universal floor covers the new output shape.
"""

from __future__ import annotations

import pandas as pd
import pytest

from shippinglanes_spark.registry import all_queries

Q = all_queries()


def _assert_diverse(name: str, pdf: pd.DataFrame, spec: dict) -> None:
    assert len(pdf) >= spec.get("min_rows", 1), (
        f"{name}: {len(pdf)} rows < {spec.get('min_rows', 1)} — "
        "degenerate-empty output (the text_js_divergence failure mode)"
    )
    for col, k in spec.get("distinct", {}).items():
        got = pdf[col].nunique()
        assert got >= k, (
            f"{name}.{col}: {got} distinct values < {k} — output "
            "collapsed to a constant (hash-green but says nothing)"
        )
    check = spec.get("check")
    if check is not None:
        assert check(pdf), f"{name}: value-shape check failed"


# contract: min_rows, per-column minimum distinct counts, optional
# whole-frame value-shape lambda. Floors are set from sf0.001 (the test
# SF) and chosen so a COLLAPSED variant fails while fixture noise
# passes.
DIVERSITY: dict[str, dict] = {
    # community detection must find >1 community (round-6 LPA collapse)
    "graph_label_propagation": {"min_rows": 5, "distinct": {"community": 2}},
    "graph_conductance": {"min_rows": 2, "distinct": {"community": 2}},
    # coalition attribution must separate the channels (round-6 Shapley
    # all-channels coalition gave identical phi for every channel)
    "evt_attribution_shapley": {
        "min_rows": 3,
        "distinct": {"shapley_value": 2},
    },
    # geofences must intersect the synthetic lon = 2*lat track line
    "geo_point_in_polygon": {"min_rows": 2, "distinct": {"zone_id": 2}},
    # drift between sources must see a non-empty shared vocabulary
    "text_js_divergence": {
        "min_rows": 1,
        "check": lambda p: bool((p["n_terms"] > 0).all()),
    },
    # saturating-graph analytics: the raw trade graph is COMPLETE at
    # sf >= 0.01, so non-edge / degree-variance outputs exist only on
    # the above-average-weight backbone — assert they stay non-trivial
    "graph_link_prediction": {
        "min_rows": 1,
        "distinct": {"jaccard_ppm": 2},
    },
    "graph_kcore": {"min_rows": 2, "distinct": {"deg_in_core": 2}},
    "graph_modularity": {"min_rows": 2, "distinct": {"contribution": 2}},
    # experiment-design outputs degenerate when both arms convert 1.0
    "agg_power_analysis": {
        "min_rows": 1,
        "check": lambda p: bool((p["p1"] != p["p2"]).all()),
    },
    # sketch intersection says nothing when segments nest or are equal
    "agg_hll_intersection": {
        "min_rows": 1,
        "check": lambda p: bool(
            (
                (p["exact_intersection"] > 0)
                & (p["exact_intersection"] < p["exact_union"])
            ).all()
        ),
    },
    # classifier eval needs >1 class present
    "pipeline_langid_eval": {"min_rows": 2, "distinct": {"lang": 2}},
    # assignment queries must actually use >1 bucket/split/score
    "pipeline_split": {"min_rows": 10, "distinct": {"split": 3}},
    "pipeline_curriculum_buckets": {"min_rows": 4, "distinct": {"bucket": 2}},
    "pipeline_eval_holdout": {
        "min_rows": 4,
        "distinct": {"rank_in_source": 2},
    },
    "pipeline_domain_mix": {"min_rows": 10, "distinct": {"kept": 2}},
    "evt_rfm_scores": {
        "min_rows": 5,
        "distinct": {"f_score": 2, "m_score": 2},
    },
    # symbolic/stationary outputs collapse if every series looks alike
    "ts_sax": {"min_rows": 2, "distinct": {"sax_word": 2}},
    "evt_markov_stationary": {
        "min_rows": 2,
        "distinct": {"stationary_prob": 2},
    },
    "agg_bh_fdr": {"min_rows": 2, "distinct": {"p_value": 2}},
    "geo_geohash": {"min_rows": 2, "distinct": {"cell5": 2}},
    # round-7 additions: the capture windows must NOT catch everyone
    # (day-sized windows did, caught pre-registration), the SPRT walk
    # must actually reach a decision, calibration must spread users
    # over bins, and a flat series emits no crossovers
    "agg_capture_recapture": {
        "min_rows": 1,
        "check": lambda p: bool((p["m"] < p[["n1", "n2"]].min(axis=1)).all()),
    },
    "agg_sprt": {"min_rows": 1},
    "agg_calibration_bins": {"min_rows": 5, "distinct": {"bin": 5}},
    "ts_wma_crossover": {"min_rows": 2, "distinct": {"crossover": 2}},
    # every crossing pair on the lon = 2*lat line bottoms out at 0.0 —
    # a closest-first top-k was 50 identical zeros (caught and fixed
    # pre-registration: the output is the per-pair table instead)
    "geo_cpa": {"min_rows": 2, "distinct": {"cpa_deg": 2}},
    "ts_dtw": {"min_rows": 2, "distinct": {"dtw_cost": 2}},
    # round-8: the band must not push every pair to the INF sentinel
    "ts_dtw_banded": {
        "min_rows": 2,
        "distinct": {"dtw_cost": 2},
        "check": lambda p: bool((p["dtw_cost"] < 10**15).any()),
    },
    # round-8 pack: rankings must separate nations (not all-perfect /
    # all-miss), concentration and distribution outputs must vary,
    # the PH walk must move, Lorenz must reach exactly 100% and show
    # actual inequality below the top decile
    "rank_ndcg": {
        "min_rows": 2,
        "distinct": {"ndcg_ppm": 2},
        "check": lambda p: bool((p["ndcg_ppm"] < 1000000).any()),
    },
    "rank_mrr": {
        "min_rows": 2,
        "distinct": {"rr_micro": 2},
        "check": lambda p: bool((p["first_hit_rank"] > 0).any()),
    },
    "agg_hhi": {"min_rows": 2, "distinct": {"hhi_e12": 2}},
    "agg_lorenz": {
        "min_rows": 10,
        "distinct": {"cum_bal_ppm": 10},
        "check": lambda p: bool(
            p["cum_bal_ppm"].iloc[-1] == 1000000
            and (p["cum_bal_ppm"][:-1] < p["cum_cust_ppm"][:-1]).all()
        ),
    },
    "agg_trimmed_mean": {"min_rows": 2, "distinct": {"mean_micro": 2}},
    "ts_page_hinkley": {"min_rows": 2, "distinct": {"m_scaled": 2}},
    # round-8 pack 2: sequence support must not be the full 25-pair
    # grid at 1e6 ppm (everyone-does-everything collapse); the top-30
    # trade lanes must fragment into >1 component with a real bloc
    "evt_seq_support": {
        "min_rows": 4,
        "distinct": {"support_ppm": 2},
        "check": lambda p: bool((p["support_ppm"] < 1000000).any()),
    },
    "graph_connected_components": {
        "min_rows": 5,
        "distinct": {"component": 2},
        "check": lambda p: bool((p["comp_size"] > 1).any()),
    },
    # round-8 pack 3: fertility must separate (lang, source) cells;
    # dominance must not report every doc as pure single-language
    "pipeline_tokenizer_fertility": {
        "min_rows": 2,
        "distinct": {"chars_per_token_milli": 2},
    },
    "text_marker_dominance": {
        "min_rows": 5,
        "distinct": {"dominant_share_ppm": 3},
        "check": lambda p: bool((p["n_langs_present"] > 1).any()),
    },
    "agg_atkinson": {"min_rows": 2, "distinct": {"atkinson_half": 2}},
    "text_hapax_ratio": {"min_rows": 2, "distinct": {"hapax_ppm": 2}},
    "ts_matrix_profile": {"min_rows": 2, "distinct": {"mp_sq": 2}},
    "profile_t_closeness": {"min_rows": 2, "distinct": {"t_ppm": 2}},
    "text_burrows_delta": {"min_rows": 2, "distinct": {"delta": 2}},
    "evt_causal_impact": {
        "min_rows": 1,
        "check": lambda p: bool((p["predicted_post"] > 0).all()),
    },
    "agg_mde": {
        "min_rows": 1,
        "check": lambda p: bool(
            ((p["baseline_rate"] > 0) & (p["baseline_rate"] < 1)).all()
        ),
    },
    # round-8 pack 4: the signed-rank z must spread AND change sign
    # across nations (an all-positive z says the pairing is trivial);
    # MAP must produce partial precision (not all-0 / all-perfect);
    # effect sizes must separate regions; the Kalman LEVEL must
    # separate event types (p_var legitimately converges to the shared
    # Riccati fixed point — level is the informative column); MaxSim
    # must fill all TOPK ranks with varying scores
    "agg_wilcoxon_signed_rank": {
        "min_rows": 10,
        "distinct": {"z": 5},
        "check": lambda p: bool((p["z"] > 0).any() and (p["z"] < 0).any()),
    },
    "rank_map": {
        "min_rows": 10,
        "distinct": {"ap_micro": 5},
        "check": lambda p: bool(
            ((p["ap_micro"] > 0) & (p["ap_micro"] < 1000000)).any()
        ),
    },
    "agg_effect_size": {"min_rows": 5, "distinct": {"cohens_d": 5}},
    "ts_kalman_level": {"min_rows": 5, "distinct": {"level": 5}},
    "sim_maxsim": {
        "min_rows": 6,
        "distinct": {"maxsim": 6, "rank": 3},
    },
    # round-8 pack 5: Friedman mean ranks must separate the treatments
    # (identical daily profiles would tie all five at (k+1)/2); TOST
    # t-bounds must vary by class; RBO must neither be all-disjoint
    # (0) nor all-identical (~0.999e9); top-p must keep a head AND
    # drop a tail in at least one language
    "agg_friedman": {"min_rows": 5, "distinct": {"mean_rank_milli": 4}},
    "agg_tost_equivalence": {"min_rows": 4, "distinct": {"t_lower": 4}},
    "rank_rbo": {
        "min_rows": 10,
        "distinct": {"rbo_nano": 5},
        # zero-common nations are LEGAL rows reporting rbo_nano = 0
        # (left-join shape); require some positive signal, the
        # identical-ranking ceiling, and the zero-common discipline
        "check": lambda p: bool(
            (p["rbo_nano"] >= 0).all()
            and p["rbo_nano"].max() > 0
            and (p["rbo_nano"] < 990000000).all()
            and (p.loc[p["n_common"] == 0, "rbo_nano"] == 0).all()
        ),
    },
    "pipeline_topp_sources": {
        "min_rows": 20,
        "distinct": {"cum_ppm": 10},
        "check": lambda p: bool(p["kept"].any() and not p["kept"].all()),
    },
    # round-8 pack 6: the seasonal ring must carry real signal (not
    # the zero init) and separate the types
    "ts_holt_winters": {
        "min_rows": 5,
        "distinct": {"season_next": 5},
        "check": lambda p: bool((p["season_next"] != 0.0).any()),
    },
    "sql_pipe_surface": {"min_rows": 5, "distinct": {"rev_cents": 5}},
    # the decomposition must show real reliability error AND real
    # resolution (a constant forecaster or constant outcome zeroes one)
    "agg_brier_decomposition": {
        "min_rows": 1,
        "check": lambda p: bool(
            (p["reliability"] > 0).all()
            and (p["resolution"] > 0).all()
            and ((p["brier"] > 0) & (p["brier"] < 1)).all()
        ),
    },
    # Croston must see real intermittency at the test SF (some smoothed
    # interval > 1 hour); the Heaps fit must be a genuine sub-linear
    # growth law (word-level vocabulary saturated to beta = 0 on these
    # fixtures — caught pre-registration, unit switched to trigrams)
    "ts_croston": {
        "min_rows": 5,
        "distinct": {"demand_rate": 5},
        "check": lambda p: bool((p["interval_level"] > 1.0).any()),
    },
    "text_heaps_law": {
        "min_rows": 10,
        "distinct": {"vocab": 10},
        "check": lambda p: bool(
            ((p["heaps_beta"] > 0) & (p["heaps_beta"] < 1)).all()
            and p["vocab"].is_monotonic_increasing
        ),
    },
    # ---- round-9 pack ----
    # BT ratings must differ (a no-signal win matrix would fit uniform
    # 0.2 everywhere) and stay a proper normalized profile
    "rank_bradley_terry": {
        "min_rows": 5,
        "distinct": {"rating": 3},
        "check": lambda p: bool(
            ((p["rating"] > 0) & (p["rating"] < 1)).all()
            and p["wins"].sum() * 2 == p["comparisons"].sum()
        ),
    },
    # ERR in (0, 1) with real spread; a rel-saturated corpus would pin
    # every nation at the identical-cascade ceiling
    "rank_err": {
        "min_rows": 10,
        "distinct": {"err": 5},
        "check": lambda p: bool(((p["err"] > 0) & (p["err"] < 1)).all()),
    },
    # Q must be positive and type-specific; all-identical Q would mean
    # the per-type series collapsed to one shape
    "ts_ljung_box": {
        "min_rows": 5,
        "distinct": {"q_stat": 5},
        "check": lambda p: bool((p["q_stat"] > 0).all()),
    },
    # alpha strictly inside (-1, 1) and item variances all positive
    # (a zero-variance item would make the ratio degenerate)
    "agg_cronbach_alpha": {
        "min_rows": 5,
        "distinct": {"b_item": 5},
        "check": lambda p: bool(
            (p["b_item"] > 0).all()
            and (p["alpha"].abs() < 1).all()
        ),
    },
    # priorities are price-independent by construction, so z hovers
    # near 0 — but the five regions' exact moments must differ, and z
    # must never be NaN/inf (the variance guard)
    "agg_cochran_armitage": {
        "min_rows": 5,
        "distinct": {"z_trend": 5, "dose_hits": 5},
        "check": lambda p: bool(p["z_trend"].abs().max() < 10),
    },
    # pairs must clear the margin, chosen must strictly beat rejected,
    # and scores must vary across pairs (a flat corpus emits nothing)
    "pipeline_preference_pairs": {
        "min_rows": 10,
        "distinct": {"margin_milli": 5},
        "check": lambda p: bool(
            (p["chosen_score"] > p["rejected_score"]).all()
            and (p["margin_milli"] >= 50).all()
            and (p["chosen_doc"] != p["rejected_doc"]).all()
        ),
    },
    # PAV must genuinely pool (fewer blocks than the 10 input bins),
    # the fit must be monotone, and rates must not collapse flat
    "agg_isotonic_calibration": {
        "min_rows": 2,
        "distinct": {"rate_ppm": 2},
        "check": lambda p: bool(
            p["n_bins"].sum() == 10
            and len(p) < 10
            and p["rate_ppm"].is_monotonic_increasing
            and (p["n_bins"] > 1).any()
        ),
    },
    # precision strictly inside [0, 1e6) with real spread — an
    # all-saturated corpus (every trigram re-occurring elsewhere)
    # would pin every source at 1e6
    "text_self_bleu": {
        "min_rows": 20,
        "distinct": {"self_bleu_ppm": 10},
        "check": lambda p: bool(
            (p["self_bleu_ppm"] < 1_000_000).all()
            and (p["self_bleu_ppm"] >= 0).all()
        ),
    },
    # ---- round-10 pack ----
    # A^2 nonnegative with real pair-to-pair spread — identical
    # distributions everywhere would flatten the statistic
    "agg_anderson_darling": {
        "min_rows": 10,
        "distinct": {"a2": 8},
        "check": lambda p: bool(
            (p["a2"] >= 0).all()
            and p["a2"].max() - p["a2"].min() > 0.2
        ),
    },
    # multicollinearity must be REAL (all VIFs well above the
    # independence value 1) and region-specific
    "agg_vif": {
        "min_rows": 5,
        "distinct": {"vif_items": 5, "r_items_qty": 5},
        "check": lambda p: bool(
            (p[["vif_items", "vif_qty", "vif_price"]] > 2).all().all()
        ),
    },
    # TLS must dominate OLS (positive covariance) in every region and
    # slopes must differ across regions
    "agg_deming": {
        "min_rows": 5,
        "distinct": {"slope_deming": 5},
        "check": lambda p: bool(
            (p["slope_deming"] > p["slope_ols"]).all()
        ),
    },
    # A-counts far from the ln(0) cliff, entropy positive and finite,
    # per-type counts genuinely type-specific
    "ts_sample_entropy": {
        "min_rows": 5,
        "distinct": {"b_pairs": 5, "a_pairs": 5},
        "check": lambda p: bool(
            (p["a_pairs"] > 100).all()
            and (p["b_pairs"] > p["a_pairs"]).all()
            and (p["sampen"] > 0).all()
        ),
    },
    # windowed diversity must spread across buckets and stay a proper
    # ratio; an all-repetition or all-distinct corpus would pin it
    "text_mattr": {
        "min_rows": 20,
        "distinct": {"avg_mattr_ppm": 10},
        "check": lambda p: bool(
            (p["avg_mattr_ppm"] > 300_000).all()
            and (p["max_mattr_ppm"] <= 1_000_000).all()
            and (p["min_mattr_ppm"] <= p["avg_mattr_ppm"]).all()
        ),
    },
    # the top-K must be fully allocated and position bias must be
    # VISIBLE (some group's exposure share != its slot share)
    "rank_exposure": {
        "min_rows": 2,
        "distinct": {"exposure_ppm": 2},
        "check": lambda p: bool(
            p["docs_top"].sum() == 100
            and (p["fairness_milli"] != 1000).any()
        ),
    },
    # strict-cast and missing-path columns must be ALL null (the
    # semantics under test), real paths all populated
    "fn_variant_nested": {
        "min_rows": 100,
        "distinct": {"pri": 3, "mod7": 7},
        "check": lambda p: bool(
            p["missing"].isna().all()
            and p["strict"].isna().all()
            and p["pri"].notna().all()
            and p["ckey"].notna().all()
        ),
    },
    # VR must spread across types (a pure random walk everywhere would
    # pin every type at 1) and stay positive
    "ts_variance_ratio": {
        "min_rows": 5,
        "distinct": {"vr": 5},
        "check": lambda p: bool(
            (p["vr"] > 0).all() and p["vr"].max() - p["vr"].min() > 0.1
        ),
    },
    # extrema counts must be interior (0 or n-2 would mean a monotone
    # or sawtooth series — both fixture-impossible) and type-specific
    "ts_turning_points": {
        "min_rows": 5,
        "distinct": {"turning_points": 3},
        "check": lambda p: bool(
            (p["turning_points"] > 0).all()
            and (p["turning_points"] < p["n_days"] - 2).all()
        ),
    },
    # the confounder story must HOLD: strong raw qty-price correlation,
    # near-zero once item count is partialled out, in every region
    "agg_partial_correlation": {
        "min_rows": 5,
        "distinct": {"p_items_qty_price": 5},
        "check": lambda p: bool(
            (p["r_qty_price"] > 0.5).all()
            and (p["p_qty_price_items"].abs() < 0.1).all()
        ),
    },
    # conditional structure must be real (context reduces entropy) and
    # language-specific
    "text_entropy_rate": {
        "min_rows": 5,
        "distinct": {"h_rate": 5},
        "check": lambda p: bool(
            (p["info_gain"] > 0).all() and (p["h_rate"] > 0).all()
        ),
    },
    # incidence curves must rise over multiple event days and respect
    # AJ additivity (cif_p + cif_e <= 1); only the purchase curve gets
    # a distinct floor — at sf0.001's 15 users the error curve can
    # legitimately jump on a single day
    "evt_cumulative_incidence": {
        "min_rows": 2,
        "distinct": {"cif_purchase": 2},
        "check": lambda p: bool(
            p.sort_values("day")["cif_purchase"]
            .is_monotonic_increasing
            and p.sort_values("day")["cif_error"].is_monotonic_increasing
            and ((p["cif_purchase"] + p["cif_error"]) <= 1.0 + 1e-9).all()
        ),
    },
    # the variable threshold must actually filter (every flag keeps
    # rows, none keeps everything)
    "sql_variables_exec": {
        "min_rows": 3,
        "distinct": {"qty": 3},
        "check": lambda p: bool((p["n"] > 0).all()),
    },
    # the Walsh-median must be a genuine location estimate (near the
    # mean, not a collapsed constant); at sf0.001's ~7-count days the
    # half-integer medians legitimately land on few distinct values,
    # so the distinct floor is 2 with the proximity check as the teeth
    "agg_hodges_lehmann": {
        "min_rows": 5,
        "distinct": {"hl": 2, "mean_daily": 5},
        "check": lambda p: bool(
            ((p["hl"] - p["mean_daily"]).abs()
             < 0.2 * p["mean_daily"]).all()
        ),
    },
    # unseen mass must be real (chao1 well above V) and singletons
    # plentiful — a saturated vocabulary would pin f1 ~ 0
    "text_chao1": {
        "min_rows": 5,
        "distinct": {"chao1": 5},
        "check": lambda p: bool(
            (p["chao1"] > 1.5 * p["v_obs"]).all()
            and (p["f1"] > p["f2"]).all()
            and ((p["coverage"] > 0) & (p["coverage"] < 1)).all()
        ),
    },
    # the sketch must preserve norms on average (mean ratio near 1)
    # and produce genuinely spread projections
    "emb_jl_projection": {
        "min_rows": 100,
        "distinct": {"proj0": 50, "norm_ratio": 50},
        "check": lambda p: bool(
            0.8 < p["norm_ratio"].mean() < 1.2
            and (p["proj0"] < 0).any()
            and (p["proj0"] > 0).any()
        ),
    },
    # overlap must be partial (0 < overlap < full) with real spread —
    # identical docs or disjoint vocabularies would both be wrong here
    "pipeline_pair_rouge": {
        "min_rows": 10,
        "distinct": {"f1_ppm": 10},
        "check": lambda p: bool(
            (p["overlap"] > 0).all()
            and (p["f1_ppm"] < 1_000_000).all()
            and (
                (p["f1_ppm"] >= p[["p_ppm", "r_ppm"]].min(axis=1))
                & (p["f1_ppm"] <= p[["p_ppm", "r_ppm"]].max(axis=1))
            ).all()
        ),
    },
    # the backtest must discriminate (SSEs spread across types) and
    # forecasts must sit inside the count range
    "ts_ses_select": {
        "min_rows": 5,
        "distinct": {"sse": 5},
        "check": lambda p: bool(
            (p["best_alpha_eighths"].between(1, 7)).all()
            and (p["forecast"] > 0).all()
        ),
    },
    # key discovery must find the planted truth: exactly one scalar
    # key, enums far from unique, the composite high but visible
    "profile_key_candidates": {
        "min_rows": 7,
        "distinct": {"uniqueness_ppm": 5},
        "check": lambda p: bool(
            p["is_key"].sum() >= 1
            and (p.set_index("col").loc["o_orderkey", "is_key"])
            and not p.set_index("col").loc["o_orderstatus", "is_key"]
        ),
    },
    # each region's two orderings must actually reorder (alpha vs
    # key-desc agree only if insertion order coincides — assert the
    # delimiter arity instead, which a dropped row would break)
    # round-11 de-vacuation (VERDICT r10 items 2-3): both queries
    # hash-matched on EMPTY results at the driver SF in round 10 — a
    # hash over zero rows certifies the schema, not the operator.
    # join_anti now anti-joins the $400k-filtered order subset (the
    # complement of join_semi): 20 no-big-order customers at sf0.001.
    "join_anti": {"min_rows": 20, "distinct": {"c_custkey": 20}},
    # sql_scripting_surface's look-ahead stop rule keeps > _SSS_STOP_N
    # survivors at convergence: the ROLLUP must show the ALL row with
    # n > 200 AND the per-priority rows summing to it — this is the
    # non-empty certificate the round-10 green lacked.
    "sql_scripting_surface": {
        "min_rows": 3,
        "distinct": {"priority": 3},
        "check": lambda p: bool(
            (p.loc[p["priority"] == "ALL", "n"] > 200).all()
            and p.loc[p["priority"] == "ALL", "n"].sum()
            == p.loc[p["priority"] != "ALL", "n"].sum()
        ),
    },
    "agg_listagg": {
        "min_rows": 5,
        "distinct": {"nations_alpha": 5},
        "check": lambda p: bool(
            (
                p["nations_alpha"].str.count(",")
                == p["n_nations"] - 1
            ).all()
            and (
                p["nations_bykey_desc"].str.count(r"\|")
                == p["n_nations"] - 1
            ).all()
        ),
    },
}


# Universal no-collapse floor (round-8, VERDICT r7 item 7): every
# declared query not already under a targeted DIVERSITY contract gets
# the weakest useful check — non-empty output, and if the frame has >=2
# rows, SOME column must show >=2 distinct values (keyed outputs pass
# trivially; a multi-row frame of identical rows is exactly the
# hash-green-but-says-nothing shape this audit exists for). Queries
# whose outputs are LEGITIMATELY constant at the test SF are exempted
# by name with the reason inline — the exemption list is part of the
# audit, not an escape hatch.
UNIVERSAL_EXEMPT: dict[str, str] = {
    # Round-8 sweep triage: all 8 empties verified NON-empty at a
    # higher SF via their own oracles (DuckDB, 2026-08-15), i.e.
    # fixture-scale sparsity, not collapse. Row counts noted.
    "agg_having": "HAVING floor unmet at sf0.001; 12 rows at sf0.01",
    "set_except": "EXCEPT empty at sf0.001; 9 rows at sf0.01",
    "tpch_q7_volume_shipping": "0 at sf0.001; 14 rows at sf0.01",
    "dedup_exact": "no exact dup docs below sf0.1; 8 dup groups there",
    "evt_bursts": "no 3x-mean bursts below sf0.1; 4 rows there",
    "tpch_q22_global_balance": "0 below sf0.1; 1 row there",
    "sim_ann_lsh": "documented 0-row fixture (register notes); "
    "planted-pair recall floors in tests/test_dedup.py",
}


def test_universal_no_collapse(spark, sf_dir):
    failures: list[str] = []
    for name, q in sorted(Q.items()):
        if not q.declare or name in DIVERSITY or name in UNIVERSAL_EXEMPT:
            continue
        try:
            pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # surface, keep sweeping
            failures.append(f"{name}: raised {type(exc).__name__}: {exc}")
            continue
        if len(pdf) == 0:
            failures.append(f"{name}: empty output")
        elif len(pdf) >= 2 and all(
            pdf[c].astype(str).nunique() <= 1 for c in pdf.columns
        ):
            failures.append(
                f"{name}: {len(pdf)} identical rows — constant frame"
            )
    assert not failures, (
        f"{len(failures)} declared queries produced collapse-shaped "
        f"output:\n" + "\n".join(failures)
    )


@pytest.mark.parametrize("name", sorted(DIVERSITY))
def test_output_not_degenerate(spark, sf_dir, name):
    pdf = Q[name].fn(spark, sf_dir).toPandas()
    _assert_diverse(name, pdf, DIVERSITY[name])


def test_audit_catches_planted_collapse():
    """The checker itself must reject a collapsed frame — the planted
    degenerate variant of the round-6 LPA bug."""
    collapsed = pd.DataFrame(
        {"nation_id": range(25), "community": [7] * 25}
    )
    with pytest.raises(AssertionError, match="collapsed to a constant"):
        _assert_diverse(
            "planted", collapsed, {"min_rows": 5, "distinct": {"community": 2}}
        )
    with pytest.raises(AssertionError, match="degenerate-empty"):
        _assert_diverse("planted", collapsed.iloc[:0], {"min_rows": 1})
