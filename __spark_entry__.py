"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (MRCA over the ancestor closure —
the reference's core graph operation, opentree/GraphExplorer.java:617-650)
on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator suite
from SURVEY.md §2; implementations live in treemachine_spark/workload/.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from treemachine_spark.workload.oracles import ORACLES  # noqa: E402
from treemachine_spark.workload.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["t2_mrca"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(ORACLES)
