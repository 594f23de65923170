"""Lake maintenance utilities: small-file compaction and incremental
rollup maintenance — the operational half of a 100 TB parquet lake.

- `compact(...)`: rewrite a parquet directory into ~target-sized files
  (small-file explosion is the classic lake pathology: every file costs
  a task + a footer read; compaction restores scan efficiency).
- `incremental_rollup(...)`: maintain a daily aggregate table with
  Structured Streaming `foreachBatch` — each micro-batch upserts its
  days into the rollup by overwriting affected partitions, so reruns are
  idempotent and the rollup equals the batch aggregate at every point.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import as_date, money
from ..session import apply_runtime_confs


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite src_dir's parquet into ~target_file_bytes files at
    dst_dir. Returns the file count written. Uses the source's on-disk
    size to pick the output file count (repartition, not coalesce, so
    skewed inputs still rebalance)."""
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    out = spark.read.parquet(dst_dir)
    assert out.count() == df.count()
    import glob

    return len(glob.glob(f"{dst_dir}/*.parquet"))


def incremental_rollup(spark: SparkSession, sf_dir: str, rollup_dir: str):
    """Maintain a per-(day, event_type) rollup of events via foreachBatch.

    Each micro-batch aggregates its rows and overwrites the affected day
    partitions (dynamic partition overwrite), making replays idempotent.
    Returns the streaming query (caller awaits termination)."""
    apply_runtime_confs(spark)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    def upsert(batch: DataFrame, batch_id: int) -> None:
        agg = batch.groupBy(
            as_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("value")).alias("sum_value"),
        )
        # dynamic mode: only partitions present in `agg` are replaced
        agg.write.mode("overwrite").partitionBy("day").parquet(rollup_dir)

    return (
        stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{rollup_dir}_ckpt")
        .start()
    )
