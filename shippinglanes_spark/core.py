"""Shared expression helpers keeping Spark<->DuckDB oracle parity.

Cross-engine discipline (see FIXTURES.md "gotchas"):
- timestamps in OUTPUT: cast to date or epoch-µs bigint on both sides;
- money/ratio aggregates: ROUND identically on both sides;
- integer aggregates in DuckDB: CAST(... AS BIGINT) (sum(int) is HUGEINT);
- window order: always add a unique tiebreak key (event_id / o_orderkey).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch for a TimestampType column (UTC session).

    Matches DuckDB's ``epoch_us(ts)`` on the same naive data.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def money(col: Column, dp: int = 2) -> Column:
    """Round a monetary/float aggregate for hash stability."""
    return F.round(col, dp)


def as_date(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("date")


def fan_out(df, min_partitions: int | None = None):
    """Redistribute a narrow DataFrame whose source has fewer splits than
    the cluster has cores, so a compute-heavy downstream expression (JSON
    parse, regex, UDF) parallelizes.

    Single-file single-row-group parquet inputs scan as ONE task no
    matter what maxPartitionBytes says (a row group is the atomic split
    unit), serializing everything fused into the scan stage. A 100 TB
    table has thousands of row groups and never needs this; it exists for
    the small-source + expensive-map shape and is a no-op when the input
    is already split at least as wide as the session's parallelism.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
