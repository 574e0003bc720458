"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference README's grid-binning
example, README.md:24-35) at sf0.001. ``queries()`` / ``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 with its DuckDB twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from osmpbf_spark.operators.grid import q_grid_agg

    return q_grid_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from osmpbf_spark.catalog import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin SQL for each SQL-expressible query in ``queries()``."""
    from osmpbf_spark.catalog import all_oracles

    return all_oracles()
