"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 1-minute tier rollup."""
    from ecov003_l2t_stars_spark.plans.driver_queries import q_rollup_1m

    return q_rollup_1m(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ecov003_l2t_stars_spark.plans.driver_queries import QUERIES
    from ecov003_l2t_stars_spark.plans.driver_queries_text import QUERIES_TEXT

    return {**QUERIES, **QUERIES_TEXT}


def oracle_sql() -> dict[str, str]:
    from ecov003_l2t_stars_spark.plans.driver_queries import ORACLE_SQL
    from ecov003_l2t_stars_spark.plans.driver_queries_text import (
        ORACLE_SQL_TEXT,
    )

    return {**ORACLE_SQL, **ORACLE_SQL_TEXT}
