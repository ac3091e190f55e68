"""Stream-monitoring demo over the events table — the operational half
of the engine (curate.py cleans corpora, pretraining_build.py ships
them, this watches what's flowing):

    categorical drift (chi2/PSI) -> numeric drift (exact KS) ->
    metric trend -> per-user CUSUM changepoints -> EMA-residual
    outliers -> matrix-profile discords -> seasonal baseline

Run from anywhere:

    python examples/monitor.py [sf_dir]

Each block is one declarative operator from patternly_spark.operators.
The same computations are oracle-checked as q109/q114/q129/q130/q127/
q131/q132 in __spark_entry__.py, and the drift/EMA/CUSUM monitors have
stateful streaming twins in patternly_spark.streaming.drift.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from pyspark.sql import Window
from pyspark.sql import functions as F

from patternly_spark.operators.drift import categorical_drift, cusum, ks_drift, linear_trend
from patternly_spark.operators.normalize import mad_outliers
from patternly_spark.operators.temporal import discords, ema
from patternly_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
print(f"monitoring {events.count()} events from {sf_dir}\n")

# 1. categorical drift: is each day's event-type mix still the global mix?
daily = events.withColumn("day", F.to_date("ts"))
drift = categorical_drift(daily, "event_type", by="day").orderBy(F.desc("chi2"))
print("categorical drift (worst 3 days by chi2):")
drift.show(3, truncate=False)

# 2. numeric drift: each event type's value distribution vs the global sample
print("exact KS distance per event type vs the pooled sample:")
ks_drift(events.select("event_type", "value"), "value", by="event_type").orderBy(
    F.desc("ks")
).show(5, truncate=False)

# 3. trend: which way is each metric moving?
epoch_s = F.col("ts").cast("timestamp").cast("double")
t0 = events.agg(F.min(F.col("ts").cast("timestamp").cast("double"))).collect()[0][0]
hours = (epoch_s - F.lit(float(t0))) / 3600.0
trends = linear_trend(
    events.select("event_type", hours.alias("h"), "value"), "h", "value", by="event_type"
)
print("per-type value trend (slope per hour):")
trends.orderBy(F.desc("slope")).show(5, truncate=False)

# 4. CUSUM: users whose value level shifted persistently
alarms = cusum(
    events, "value", by="user_id", order_col=["ts", "event_id"],
    target=50.0, slack=25.0, threshold=250.0,
)
n_alarm_users = alarms.filter("alarm").select("user_id").distinct().count()
print(f"CUSUM: {n_alarm_users} users with persistent level shifts\n")

# 5. EMA-residual spikes: events far from their own stream's recent level
base = ema(events, "value", by="user_id", order_col=["ts", "event_id"], alpha=0.25)
w = Window.partitionBy("user_id").orderBy("ts", "event_id")
resid = base.withColumn(
    "residual", F.coalesce(F.col("value") - F.lag("ema").over(w), F.lit(0.0))
)
spikes = mad_outliers(resid, "residual", by=None, k=3.0).filter("is_outlier")
print(f"EMA-residual outliers: {spikes.count()} events\n")

# 6. discords: the subsequences most unlike anything else in their stream
print("matrix-profile discords (first 30 users, window 8):")
discords(
    events.filter(F.col("user_id") < 30), "value",
    by="user_id", order_col=["ts", "event_id"], window=8, top_k=1,
).orderBy(F.desc("nn_dist")).show(5, truncate=False)

print("done")
