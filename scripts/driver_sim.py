"""Full driver-gate rehearsal: run every oracle-checked queries() entry
through a VANILLA SparkSession (default confs, 200 shuffle partitions —
the exact conditions of the external harness, which the repo session's
32-partition config does NOT reproduce) and compare against DuckDB with
the same normalization the oracle-parity tests use.  Catches any
partition-count- or session-conf-dependent nondeterminism the repo-
session tests could mask.  Usage: cd /tmp && python /root/repo/scripts/driver_sim.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e

con = duckdb.connect()
for t in e.TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # array cells (list/ndarray) -> tuples so multi-key sort can hash
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


queries, oracles = e.queries(), e.oracle_sql()
# DRIVER_SIM_ONLY=q58_top_tokens,q77_rrf_hybrid,... replays a subset —
# the NOTES rotating spot-check command a third party can run verbatim
only = os.environ.get("DRIVER_SIM_ONLY")
if only:
    keep = {n.strip() for n in only.split(",") if n.strip()}
    unknown = keep - set(queries)
    if unknown:
        sys.exit(f"DRIVER_SIM_ONLY names unknown queries: {sorted(unknown)}")
    queries = {n: f for n, f in queries.items() if n in keep}
bad = []
results: dict = {}
for name, fn in queries.items():
    sql = oracles.get(name)
    rec = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": None, "oracle_rows": None, "err": None,
    }
    results[name] = rec
    try:
        spdf = fn(spark, SF_DIR).toPandas()
        rec["spark_rows"] = len(spdf)
        if sql is None:
            rec["err"] = "rows-only (no oracle by design)"
            rec["verified_by"] = getattr(e, "verified_by", dict)().get(
                name, "unit/property tests (see tests/)"
            )
            print(f"ROWS-ONLY {name} {len(spdf)}", flush=True)
            continue
        opdf = con.execute(sql).df()
        rec["oracle_rows"] = len(opdf)
        if len(spdf) != len(opdf):
            raise AssertionError(f"rows {len(spdf)} vs {len(opdf)}")
        rec["rows_match"] = True
        s, o = normalize(spdf), normalize(opdf)
        if list(s.columns) != list(o.columns):
            raise AssertionError(f"columns {list(s.columns)} vs {list(o.columns)}")
        rec["schema_match"] = True
        for c in s.columns:
            sv, ov = s[c].to_numpy(), o[c].to_numpy()
            if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
                sv, ov = sv.astype(float), ov.astype(float)
                eq = (sv == ov) | (np.isnan(sv) & np.isnan(ov))
            else:
                eq = np.array([a == b for a, b in zip(sv.tolist(), ov.tolist())])
            if not eq.all():
                raise AssertionError(f"{c}: {int((~eq).sum())} value mismatches")
        rec["hash_match"] = True  # value-exact compare, stronger than a hash
        print(f"OK {name} {len(spdf)}", flush=True)
    except Exception as ex:
        rec["err"] = str(ex)[:300]
        for k in ("rows_match", "schema_match", "hash_match"):
            if rec[k] is None:
                rec[k] = False
        bad.append((name, str(ex)[:300]))
        print(f"FAIL {name}: {str(ex)[:200]}", flush=True)

out_path = os.environ.get("DRIVER_SIM_JSON")
if out_path:
    import json

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}", flush=True)

print(f"checked {len(queries)} queries; failures: {len(bad)}", flush=True)
for n, m in bad:
    print(" -", n, m, flush=True)
sys.exit(1 if bad else 0)
