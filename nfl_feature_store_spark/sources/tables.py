"""Parquet table loaders for the driver-generated testdata star schema.

Analog of the reference's per-season parquet scans
(reference feature_store_runner.py:39-48, src/pumps/player_game.py:694-695):
partition-pruned reads of a columnar table. On a real deployment these are
Iceberg scans (``spark.read.format("iceberg")``) with snapshot-aware pruning;
the sandbox uses plain parquet files so Catalyst still gets predicate
pushdown + column pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
