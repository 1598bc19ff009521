"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL pipeline (dstapel/Dieter---ETL---MonarchMoney).

The reference is a single-threaded Python ETL that delegates all relational
work (filters, aggregates, group-by, ordering, pagination) to a remote
GraphQL server and does flattening/merging as straight-line Python over
lists of dicts. This package re-expresses every one of those capabilities
as Spark DataFrame operations over Parquet tables, where Catalyst supplies
the optimization the reference delegates to the remote server — plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference lacks.

Design rules (SURVEY.md §7):
- DataFrame/SQL only; zero row-at-a-time Python UDFs in hot paths.
- Small dims broadcast; facts partitioned by date; AQE on.
- All money math is per-row rounded then exact-decimal summed so results
  are deterministic and oracle-checkable (SURVEY.md §7.5 float-vs-decimal).
"""

from dieter___etl___monarchmoney_spark.session import get_spark, ship_package

__all__ = ["get_spark", "ship_package"]
__version__ = "0.1.0"
