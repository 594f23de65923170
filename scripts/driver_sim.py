"""Driver-contract simulator: plain SparkSession (no engine confs — the
point is that the engine must self-configure), __spark_entry__ surface,
DuckDB hash-compare.

    python scripts/driver_sim.py                       # sf0.01, UTC
    python scripts/driver_sim.py "America/New_York"    # non-UTC probe
    SPARK_GRAFT_SIM_SF=/root/testdata/sf0.1 python scripts/driver_sim.py

Expect `RESULT: ALL GREEN`; exit code 1 on any mismatch."""
import os
import hashlib
import sys

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
TZ = sys.argv[1] if len(sys.argv) > 1 else None

from pyspark.sql import SparkSession

b = SparkSession.builder.master("local[8]").config("spark.ui.enabled", "false")
if TZ:
    b = b.config("spark.sql.session.timeZone", TZ)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E

import duckdb
import pandas as pd

_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings"]


def _fresh_con():
    """A bounded, spill-capable DuckDB connection. One long-lived
    connection accumulates buffer-pool state across a 450-query sf0.1
    sweep until allocation fails (observed: two oracle OOMs then a
    segfault at the 2026-08-15 close); recycling the connection every N
    oracles is the real fix (it stops the accumulation), the 48 GB cap
    + spill directory are the backstop. Do NOT set the cap low: under
    24 GB the 4-way-join oracles go external and spill tens of GB. The
    real driver compares at sf0.01, far below any of this."""
    c = duckdb.connect()
    c.sql("SET memory_limit='48GB'")
    c.sql("SET temp_directory='/tmp/duck_sim_spill'")
    for t in _TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


_CON_RECYCLE = 40  # oracles per connection
con = _fresh_con()

r = E.entry(spark).collect()
assert len(r) > 0
print(f"entry: {len(r)} rows OK", flush=True)


def canon(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    cells = []
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            cells.append(s.map(lambda v: "" if pd.isna(v) else f"{v:.9g}"))
        elif pd.api.types.is_datetime64_any_dtype(s):
            cells.append(s.astype("string").str.replace(" 00:00:00", "", regex=False).fillna(""))
        else:
            cells.append(s.map(lambda v: "" if v is None or v is pd.NA else str(v)))
    rows = sorted("\x01".join(str(x) for x in tup) for tup in zip(*cells)) if cells else []
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


qs = E.queries()
oracles = E.oracle_sql()
only = os.environ.get("SPARK_GRAFT_SIM_ONLY")
if only:
    names = {n.strip() for n in only.split(",") if n.strip()}
    qs = {k: v for k, v in qs.items() if k in names}
fail = []
vacuous = []  # hash-green on ZERO rows: certifies schema, not operator
n_hash = n_rows_only = 0
n_oracle_runs = 0
for name, fn in qs.items():
    try:
        spdf = fn(spark, SF).toPandas()
        if name not in oracles:
            n_rows_only += 1
            continue
        if n_oracle_runs and n_oracle_runs % _CON_RECYCLE == 0:
            con.close()
            con = _fresh_con()
        n_oracle_runs += 1
        opdf = con.sql(oracles[name]).df()
        ok = (len(spdf) == len(opdf)
              and sorted(spdf.columns) == sorted(opdf.columns)
              and canon(spdf) == canon(opdf))
        if ok:
            n_hash += 1
            if len(spdf) == 0:
                vacuous.append(name)
        else:
            fail.append(name)
            print(f"MISMATCH {name}: rows {len(spdf)}/{len(opdf)}", flush=True)
    except Exception as ex:
        fail.append(name)
        print(f"ERROR {name}: {str(ex)[:200]}", flush=True)

print(f"hash-green: {n_hash}  rows-only: {n_rows_only}  fail: {len(fail)}")
if vacuous:
    # not a failure by itself (some queries are legitimately sparse at
    # small SF — see tests/test_degeneracy.py UNIVERSAL_EXEMPT), but a
    # 0-row green must never again hide silently (round-10: join_anti
    # and sql_scripting_surface both greened on empty-vs-empty)
    print(f"VACUOUS 0-row greens ({len(vacuous)}): {sorted(vacuous)}")
print("RESULT: ALL GREEN" if not fail else f"RESULT: FAIL {fail}")
spark.stop()
sys.exit(1 if fail else 0)
