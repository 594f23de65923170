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
