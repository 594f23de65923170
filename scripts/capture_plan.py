"""Capture .explain("formatted") for named queries to plans/<tag>/.

    python scripts/capture_plan.py <tag> <suffix> name1 name2 ...

Writes plans/<tag>/<name>_<suffix>.txt (suffix = before|after). Uses the
bench session shape (shuffle_partitions=8, $SPARK_GRAFT_CPUS) so the
captured plan matches what bench.py executes."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shippinglanes_spark.registry import all_queries  # noqa: E402
from shippinglanes_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plan", shuffle_partitions=8)
    registry = all_queries()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(p)
        print(f"wrote {path} ({len(p)} bytes)")


if __name__ == "__main__":
    main()
