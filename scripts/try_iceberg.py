"""Round-4 verdict item 4: attempt to exercise IcebergSink end-to-end by
resolving the Iceberg runtime jar via spark.jars.packages against a local
hadoop catalog (no network catalog service needed). The sandbox has no
outbound network (Maven Central DNS fails), so the expected outcome is a
recorded resolution failure — this script captures the literal error for
BENCH/BASELINE.md rather than asserting the constraint untested."""

from __future__ import annotations

import sys
import traceback


def main() -> int:
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("iceberg-attempt")
        .master("local[2]")
        .config(
            "spark.jars.packages",
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0",
        )
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", "/tmp/iceberg_warehouse")
    )
    try:
        spark = builder.getOrCreate()
    except Exception:
        print("SESSION-BUILD FAILED (jar resolution):")
        traceback.print_exc(limit=2)
        return 1
    try:
        spark.sql(
            "CREATE TABLE IF NOT EXISTS local.db.t (conv_id string, ts timestamp) "
            "USING iceberg PARTITIONED BY (bucket(4, conv_id))"
        )
        spark.sql("INSERT INTO local.db.t VALUES ('a', current_timestamp())")
        print("ICEBERG OK:", spark.sql("SELECT count(*) FROM local.db.t").collect())
        return 0
    except Exception:
        print("ICEBERG DDL FAILED:")
        traceback.print_exc(limit=2)
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
