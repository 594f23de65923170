"""ShippingLanes-on-Spark: a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the reference's data
wrangling capabilities (AIS-style event-stream ETL + relational
analytics) plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis). See SURVEY.md for the blueprint.
"""

from .registry import all_queries, driver_oracles, driver_queries
from .session import get_spark

__all__ = ["all_queries", "driver_oracles", "driver_queries", "get_spark"]
