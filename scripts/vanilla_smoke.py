"""Driver-environment smoke: run entry() + every queries() entry on a
VANILLA SparkSession (no repo confs, any cwd) — the exact conditions of
the external correctness harness.  Round-1 failed 16/41 queries on a
session-conf assumption; this script is the guard against regressing
that class of bug.  Usage: cd /tmp && python /root/repo/scripts/vanilla_smoke.py
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("vanilla-smoke").getOrCreate()
import __spark_entry__ as e

df = e.entry(spark)
print("entry rows:", df.count(), flush=True)
bad = []
for name, fn in e.queries().items():
    try:
        n = fn(spark, "/root/testdata/sf0.01").count()
        print("OK", name, n, flush=True)
    except Exception as ex:
        bad.append((name, str(ex)[:200]))
        print("FAIL", name, flush=True)
print("queries run:", len(e.queries()), "failures:", bad, flush=True)
sys.exit(1 if bad else 0)
