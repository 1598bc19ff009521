"""Driver-contract query definitions, grouped by SURVEY.md §2 section.

Importing this package registers every query into
``dieter___etl___monarchmoney_spark.registry``.
"""

from dieter___etl___monarchmoney_spark.queries import (  # noqa: F401
    analytics_ops,
    budget,
    core,
    curation,
    filters,
    forecast_nested,
    llm_pipeline,
    relational,
    scale_ops,
    streaming_queries,
)
