"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (brand usage + win rates, the
usp_card_usage_wins shape from the reference's
sql/db_creation_script.sql:224-241) on sf0.001.

``queries()`` / ``oracle_sql()`` — the full operator surface from
SURVEY.md §2 plus the LLM-pipeline operators; every SQL-expressible
query has a DuckDB oracle twin with matching column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cr_data_pipeline_project_spark.plans import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["q02_brand_usage_wins"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
