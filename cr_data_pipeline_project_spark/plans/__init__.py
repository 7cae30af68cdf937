"""Named query builders — the engine's ``queries()`` surface.

Every query keyed here has (a) a Spark builder ``(spark, sf_dir) ->
DataFrame`` and (b), where ANSI-SQL-expressible, a DuckDB oracle twin
with identical column names and value semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import llm_queries, reference_queries

Builder = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, Builder]:
    out: dict[str, Builder] = {}
    out.update(reference_queries.QUERIES)
    out.update(llm_queries.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(reference_queries.ORACLES)
    out.update(llm_queries.ORACLES)
    return out
