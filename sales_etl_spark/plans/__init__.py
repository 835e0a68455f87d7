"""Query plans: the engine's public query surface.

``registry`` collects every named query (a builder ``(spark, sf_dir) ->
DataFrame``) together with its DuckDB oracle SQL twin. ``core`` holds
the reference-parity surface (SURVEY.md §2); ``extensions`` the
LLM-data-pipeline surface (dedup / similarity / text / multimodal /
event-time windows).
"""

from sales_etl_spark.plans.registry import QUERY_REGISTRY, query

# Importing these modules populates the registry.
from sales_etl_spark.plans import core  # noqa: F401
from sales_etl_spark.plans import extensions  # noqa: F401
from sales_etl_spark.plans import temporal  # noqa: F401
from sales_etl_spark.plans import analytics  # noqa: F401
from sales_etl_spark.plans import trade  # noqa: F401
from sales_etl_spark.plans import resolution  # noqa: F401
from sales_etl_spark.plans import structure  # noqa: F401
from sales_etl_spark.plans import monitor  # noqa: F401
from sales_etl_spark.plans import supply  # noqa: F401

__all__ = ["QUERY_REGISTRY", "query"]
