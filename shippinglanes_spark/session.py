"""SparkSession factory for the ShippingLanes-on-Spark engine.

Design notes (100 TB mandate):
- Everything is DataFrame/Catalyst; the session is configured so that the
  same logical plans scale from local[32] to a 1000-executor cluster.
- AQE stays ON: runtime shuffle coalescing, skew-join splitting and
  broadcast-join demotion are the knobs that survive a 100x scale-up.
- `spark.sql.shuffle.partitions` is a *local testing* default (small
  fixtures); on a real cluster AQE's coalescing makes the initial number
  mostly irrelevant as long as it is high enough.
"""

from __future__ import annotations

import os
from contextlib import contextmanager as _contextmanager

from pyspark.sql import SparkSession

# Runtime confs applied to ANY session that runs engine queries (including a
# driver-provided session we did not create). All of these are documented
# runtime-settable SQL confs.
RUNTIME_CONFS = {
    # The fixture `events` table stores TIMESTAMP(NANOS) which Spark's
    # parquet reader rejects; read as int64 nanos and convert (see io.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Oracle parity: DuckDB treats naive timestamps verbatim; with a UTC
    # session TZ, Spark TIMESTAMP(=LTZ) epoch math agrees exactly.
    "spark.sql.session.timeZone": "UTC",
}


def apply_runtime_confs(spark: SparkSession) -> None:
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf may be forbidden on a locked-down session; proceed


@_contextmanager
def stream_partitions(spark: SparkSession, n: int = 8):
    """Pin ``spark.sql.shuffle.partitions`` for the duration of a
    streaming drain, then restore the caller's value.

    A streaming query captures its state-store partition count from this
    conf at query START and keeps it for the life of the checkpoint. A
    plain driver session runs the 200-partition default, so every
    micro-batch of a fixture-scale drain dispatches 200 state tasks —
    measured as most of stream_join_outer's ~5 s. Batch plans are
    untouched: the previous value is restored after the drain (and on a
    real cluster the state partition count should instead be sized to
    executor count x a small factor at the first deployment of each
    checkpoint)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    except Exception:
        prev = None  # locked-down session: run with whatever it has
    try:
        yield
    finally:
        if prev is not None:
            try:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
            except Exception:
                pass


def get_spark(
    app_name: str = "shippinglanes-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or reuse) the engine session.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, else all cores.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Local fixtures are single small parquet files; 4m splits them
        # across cores. On a real cluster leave the 128m default
        # (SPARK_GRAFT_MAX_PARTITION_BYTES to override).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Single-JVM local mode: every task is PROCESS_LOCAL, so waiting
        # for a better locality level is pure scheduler latency — measured
        # 35% off the sub-second headline suite (win_rank 0.14 -> 0.08 s
        # steady at sf0.1). On a real cluster deployment keep the default
        # (override via SPARK_GRAFT_LOCALITY_WAIT=3s).
        .config(
            "spark.locality.wait",
            os.environ.get("SPARK_GRAFT_LOCALITY_WAIT", "0s"),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.log.level", "ERROR")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    apply_runtime_confs(spark)
    return spark
