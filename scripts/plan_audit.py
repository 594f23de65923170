"""Audit the physical plan of every registered query (run from repo root).

Prints one line per query: exchanges, join strategies, scans, whether
filters were pushed — the waste detector for the 100 TB mandate. Pass
--write to regenerate PLANS.md, --write-ref to (re)commit the
machine-readable shape reference, --check to DIFF the live shapes
against that reference and exit non-zero on unexplained changes.

The --check mode is the plan-shape regression gate (round-9 verdict
item 3): PLANS.md was regenerated each round but nothing diffed it, so
a silent BHJ→SMJ flip or a pushed-filter loss — the 100× killers —
would pass every timing gate (local fixtures are too small for a bad
plan to show up as seconds). Shape changes are only accepted by
re-snapshotting with --write-ref after adjudication, which makes every
plan change a reviewed diff in git history.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shippinglanes_spark.registry import all_queries  # noqa: E402
from shippinglanes_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
REF_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plan_ref.json"
)

# Queries whose plan tuple is legitimately non-deterministic run to run
# (each with the reviewed reason). Everything else must match the ref
# EXACTLY — a new entry here is itself a reviewed diff.
VOLATILE: dict[str, str] = {}


def audit(df):
    p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    return {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", p)),
        "bhj": p.count("BroadcastHashJoin"),
        "smj": p.count("SortMergeJoin"),
        "bnlj": p.count("BroadcastNestedLoopJoin"),
        "cart": p.count("CartesianProduct"),
        "scans": p.count("FileScan"),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", p)),
        "windows": p.count("Window"),
        "topk": p.count("TakeOrderedAndProject"),
    }


def shape_conf(spark) -> dict:
    """The session confs the audited tuple can actually depend on.
    Operator presence/counts in the STATIC plan derive from the logical
    plan plus size-based strategies (broadcast threshold) and
    AQE/shuffle sizing — NOT from local[N] master parallelism, so cpus
    is deliberately absent: a ref captured at cpus=4 is comparable to a
    live audit at cpus=8 as long as these three match (ADVICE r10: the
    old hardcoded {"cpus": 4} conf stamp invited exactly that
    apples-to-oranges doubt)."""
    return {
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "auto_broadcast_join_threshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
    }


def collect(spark=None) -> tuple[list[tuple[str, dict]], dict]:
    spark = spark or get_spark(app_name="plan-audit", cpus=4, shuffle_partitions=8)
    conf = shape_conf(spark)
    rows = []
    for name, q in sorted(all_queries().items()):
        if not q.declare:
            continue  # environment-gated (e.g. TWS needs protobuf)
        if name in ("stream_lift",):  # starts a streaming query; skip
            continue
        try:
            a = audit(q.fn(spark, SF))
            rows.append((name, a))
        except Exception as e:  # pragma: no cover
            rows.append((name, {"error": str(e)[:60]}))
    return rows, conf


def check(rows: list[tuple[str, dict]]) -> int:
    """Diff live shapes against the committed reference. Additions are
    reported but pass (new queries enter the ref at the next --write-ref
    snapshot); removals are reported but pass (retired queries); any
    CHANGED tuple fails unless the query is in VOLATILE. Returns the
    number of unexplained changes (the process exit code)."""
    with open(REF_PATH) as f:
        ref = json.load(f)["shapes"]
    live = dict(rows)
    added = sorted(set(live) - set(ref))
    removed = sorted(set(ref) - set(live))
    changed = {}
    for name in sorted(set(live) & set(ref)):
        if live[name] != ref[name]:
            changed[name] = {"ref": ref[name], "now": live[name]}
    for name in added:
        print(f"NEW (not in ref, add via --write-ref): {name} {live[name]}")
    for name in removed:
        print(f"REMOVED (in ref only): {name}")
    unexplained = 0
    for name, d in changed.items():
        if name in VOLATILE:
            print(f"CHANGED (volatile: {VOLATILE[name]}): {name}")
            continue
        unexplained += 1
        diffs = {
            k: (d["ref"].get(k), d["now"].get(k))
            for k in set(d["ref"]) | set(d["now"])
            if d["ref"].get(k) != d["now"].get(k)
        }
        print(f"CHANGED: {name} {diffs}")
    print(
        f"plan-check: {len(live)} live, {len(ref)} ref, {len(added)} new, "
        f"{len(removed)} removed, {len(changed)} changed "
        f"({unexplained} unexplained)"
    )
    return 1 if unexplained else 0


def main() -> None:
    if "--check" in sys.argv:
        rows, conf = collect()
        with open(REF_PATH) as f:
            ref_conf = json.load(f).get("conf", {})
        if ref_conf and ref_conf != conf:
            print(f"CONF MISMATCH: ref {ref_conf} vs live {conf} — "
                  "shape diffs below may be conf artifacts")
        sys.exit(check(rows))
    rows, conf = collect()
    lines = [
        "# PLANS — physical-plan audit (generated by scripts/plan_audit.py)",
        "",
        "Per query: shuffle exchanges, join strategies, scans with pushed filters.",
        "CartesianProduct anywhere is a bug; SortMergeJoin is expected only for",
        "fact⋈fact shapes; windowed ops should show 1 exchange per key change.",
        "",
        "| query | exch | BHJ | SMJ | BNLJ | cart | scans | pushed | win | topk |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        if "error" in a:
            lines.append(f"| {name} | error: {a['error']} |||||||||")
            continue
        lines.append(
            f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj']} | {a['bnlj']} "
            f"| {a['cart']} | {a['scans']} | {a['pushed']} | {a['windows']} | {a['topk']} |"
        )
        flags = []
        if a["cart"]:
            flags.append("CARTESIAN")
        if a["smj"] and name.startswith(("join_", "tpch_", "agg_", "fn_", "evt_")):
            flags.append("SMJ")
        print(name, a, " ".join(flags))
    if "--write" in sys.argv:
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
        )
        with open(out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {out}")
    if "--write-ref" in sys.argv:
        shapes = {n: a for n, a in rows if "error" not in a}
        errors = {n: a["error"] for n, a in rows if "error" in a}
        with open(REF_PATH, "w") as f:
            json.dump(
                {
                    "sf": SF,
                    "conf": conf,
                    "shapes": shapes,
                    "errors": errors,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {REF_PATH} ({len(shapes)} shapes, {len(errors)} errors)")


if __name__ == "__main__":
    main()
