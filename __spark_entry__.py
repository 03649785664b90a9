"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (BM25 top-k through the full
inverted-index engine) on sf0.001; ``queries``/``oracle_sql`` expose the
operator inventory from SURVEY.md §2 plus the training-data ops
(dedup/similarity/text-analysis), implemented in
``konlspark/contract.py`` with DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from konlspark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the block-compressed inverted index over
    sf0.001 ``documents`` and run a BM25 top-10 query (WAND-pruned)."""
    return contract._engine_bm25(spark, "/root/testdata/sf0.001",
                                 ["spark", "vector"], k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
