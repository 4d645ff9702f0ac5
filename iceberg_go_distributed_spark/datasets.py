"""Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

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


def load_table(spark: SparkSession, sf_dir: str | None, name: str) -> DataFrame:
    """Load one testdata table; sf_dir=None falls back to
    $SPARK_GRAFT_SF_DIR (DEFAULT_SF_DIR)."""
    path = os.path.join(sf_dir or DEFAULT_SF_DIR, f"{name}.parquet")
    if name == "events":
        # ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
        # generations and TIMESTAMP(MICROS) isAdjustedToUTC=false in
        # others. Normalize every shape to session-TZ TIMESTAMP (UTC):
        #  - bigint  = ns-as-long (nanosAsLong conf) → truncate to µs,
        #    same as DuckDB's ns→µs cast
        #  - timestamp_ntz → cast; wall-clock == instant under UTC,
        #    matching the oracles' CAST(ts AS TIMESTAMP)
        apply_runtime_confs(spark)
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif ts_type is not None and not ts_type.startswith("timestamp"):
            raise TypeError(
                f"events.ts read as {ts_type!r}: expected bigint (ns-as-long) or "
                "timestamp. spark.sql.legacy.parquet.nanosAsLong could not be "
                f"applied (failed confs: {getattr(spark, '_failed_runtime_confs', [])})"
            )
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str | None = None, tables=TABLES) -> None:
    """Register each table as a temp view for spark.sql use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
