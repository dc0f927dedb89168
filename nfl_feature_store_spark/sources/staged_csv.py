"""Staged CSV dimension ingestion (SURVEY.md §2.1 S2).

The reference inlines an HTTP CSV fetch inside a transform
(``pd.read_csv("https://…player_info.csv")`` in decode_player_ids,
reference src/pumps/player_game.py:51) — a per-run network dependency in the
middle of the pipeline. The Spark-first shape is a SEPARATE staging job:
fetch/land the CSV to storage out-of-band, then ``stage_csv_dim`` validates
and converts it once into a typed parquet/Iceberg dimension table that the
query-side joins consume (broadcast). Queries never touch the network.

Only the landing step differs by environment (curl/airflow/object-store
replication); everything from the landed file onward is here and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stage_csv_dim(
    spark: SparkSession,
    csv_path: str,
    dest: str,
    schema: T.StructType | None = None,
    key_col: str | None = None,
    dedup_keep_last_by: str | None = None,
) -> DataFrame:
    """Landed CSV → typed, deduplicated parquet dimension table.

    * ``schema`` enforces types on read (schema-on-write for the dim store);
      omitted = header + inference (small dims only).
    * ``key_col`` declares the dimension key: rows with a NULL key are
      dropped, and duplicates collapse — keeping the row with the greatest
      ``dedup_keep_last_by`` value if given (e.g. a scrape_date), else any
      single row per key via max-struct (deterministic).
    * Overwrites ``dest`` atomically (directory overwrite; Iceberg analog is
      ``writeTo().replace()``). Returns the staged DataFrame re-read from
      ``dest`` so callers join against storage, not the CSV.
    """
    reader = spark.read.option("header", "true")
    df = reader.schema(schema).csv(csv_path) if schema is not None else reader.option(
        "inferSchema", "true"
    ).csv(csv_path)
    if key_col is not None:
        df = df.filter(F.col(key_col).isNotNull())
        order_col = dedup_keep_last_by or key_col
        others = [c for c in df.columns if c != key_col]
        packed = df.groupBy(key_col).agg(
            F.max(F.struct(F.col(order_col).alias("__o"), *[F.col(c) for c in others])).alias("__s")
        )
        df = packed.select(key_col, *[F.col(f"__s.{c}").alias(c) for c in others])
    df.write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)
