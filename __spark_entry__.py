"""Driver contract for the spark-graft builder (PySpark target).

entry()      flagship: the RML engine materializing a KG over the
             nation/region tables (class triples, typed literals, a
             referencing-object-map join) at sf0.001.
queries()    every implemented operator from SURVEY.md §2 plus the
             training-data ops (dedup / similarity / text analysis) and the
             KG-construction batch stages.
oracle_sql() DuckDB twins for all of them (rossete_rdf_spark/oracles.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rossete_rdf_spark.registry import QUERIES, oracle_sql as _oracle_sql  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["rml_nation_region_graph"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
