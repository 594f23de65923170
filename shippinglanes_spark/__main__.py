"""CLI entry point: run, explain, or list the engine's queries.

    python -m shippinglanes_spark list [--section 2.9]
    python -m shippinglanes_spark run <query> [--sf-dir DIR] [--limit N]
    python -m shippinglanes_spark explain <query> [--sf-dir DIR] [--mode formatted]
    python -m shippinglanes_spark sql "SELECT ..." [--sf-dir DIR]

`run` prints the result as a table (first --limit rows); `explain` prints
the physical plan; `sql` registers the ten fixture tables as temp views
and runs an arbitrary statement — the quickest way for a reference user
to poke at the engine interactively.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m shippinglanes_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list declared queries")
    p_list.add_argument("--section", default=None, help="filter by SURVEY §2 section")

    p_run = sub.add_parser("run", help="run one query and print rows")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument(
        "--repeat",
        type=int,
        default=1,
        help="re-execute the PREPARED plan N times (plan reused after the "
        "first run — the prepared-statement mode; see plans/prepared.py)",
    )
    p_run.add_argument(
        "--time",
        action="store_true",
        help="print per-run wall time (run 1 includes planning; later "
        "runs are execution-only)",
    )

    p_ex = sub.add_parser("explain", help="print a query's physical plan")
    p_ex.add_argument("query")
    p_ex.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p_ex.add_argument("--mode", default="formatted", choices=["simple", "extended", "formatted", "cost"])

    p_sql = sub.add_parser("sql", help="run SQL over the fixture views")
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p_sql.add_argument("--limit", type=int, default=20)

    args = ap.parse_args(argv)

    from .registry import all_queries

    if args.cmd == "list":
        qs = sorted(all_queries().values(), key=lambda q: (q.section, q.name))
        for q in qs:
            if args.section and q.section != args.section:
                continue
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{q.section:>5}  {q.name:<28} {oracle}")
        return 0

    from .session import get_spark

    spark = get_spark(app_name="shippinglanes-cli")
    if args.cmd == "sql":
        from .io import register_views

        register_views(spark, args.sf_dir)
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0

    qs = all_queries()
    if args.query not in qs:
        print(f"unknown query {args.query!r}; try: python -m shippinglanes_spark list", file=sys.stderr)
        return 2
    if args.cmd == "explain":
        df = qs[args.query].fn(spark, args.sf_dir)
        print(
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), args.mode
            )
        )
        return 0
    from .plans.prepared import PreparedQueries

    pq = PreparedQueries(spark, args.sf_dir)
    if args.repeat > 1 or args.time:
        import time as _time

        for i in range(max(args.repeat, 1)):
            t0 = _time.perf_counter()
            n = len(pq.run(args.query))
            if args.time:
                tag = "plan+exec" if i == 0 else "exec-only"
                print(
                    f"run {i + 1} ({tag}): {_time.perf_counter() - t0:.3f}s"
                    f"  ({n} rows)"
                )
    pq.dataframe(args.query).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
