"""SparkSession factory with deterministic, scale-aware defaults.

Test/bench runs use ``local[$SPARK_GRAFT_CPUS]`` (default local[*]); on a
real cluster the same conf applies unchanged — AQE handles partition
coalescing and skew joins at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "patternly-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    Deterministic settings required by the DuckDB-oracle correctness
    harness: UTC session timezone, fixed shuffle partition count, Arrow
    enabled for pandas-UDF kernels.
    """
    # make the package importable by spawned Python workers regardless of
    # the consumer's cwd (pandas-UDF kernels unpickle patternly_spark on
    # executors; PYTHONPATH is inherited by worker processes)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = pkg_root + (os.pathsep + existing if existing else "")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # GC robustness for large shuffle-sort state (guide §5): sort tasks
    # double their record-pointer arrays into 100 MiB+ allocations —
    # humongous objects spanning 32 contiguous regions under G1's 4 MiB
    # default region size at single-digit-GiB heaps — and when a JNI
    # critical section (lz4/netty) holds the GCLocker, JDK 17 abandons
    # the allocation after 2 retries and throws OOM while the heap still
    # has reclaimable room (observed verbatim in the sf100 rehearsals:
    # "Retried waiting for GCLocker too often allocating 16777218
    # words").  Raise the retry budget and the region size so a 128 MiB
    # array is 4 contiguous regions instead of 32.  Same flags on any
    # cluster size; override/disable with SPARK_GRAFT_GC_OPTS.
    gc_opts = os.environ.get(
        "SPARK_GRAFT_GC_OPTS",
        "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64"
        " -XX:G1HeapRegionSize=32m",
    )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata stores event time as TIMESTAMP(NANOS), which the
        # vectorized parquet reader rejects; read as long (ns) and convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # keep broadcast threshold generous: PFSA libraries / dimension
        # tables are tiny relative to the fact side at any scale factor
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.driver.extraJavaOptions", gc_opts)
        .config("spark.executor.extraJavaOptions", gc_opts)
        # UI off by default (test throughput); scripts/bench_scale.py sets
        # SPARK_GRAFT_UI=1 to read shuffle/spill from the REST API
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "0") in ("1", "true") and "true" or "false")
    )
    return builder.getOrCreate()


def testdata_dir(sf: str = "0.001") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", f"/root/testdata/sf{sf}")
