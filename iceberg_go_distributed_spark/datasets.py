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


DOCUMENTS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def load_documents_any(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Ingest a `documents`-shaped corpus from parquet, JSONL, or CSV —
    the formats raw training-data drops actually arrive in — normalized
    to the canonical schema (doc_id bigint, text, lang, source,
    n_chars). Format is inferred from the extension when not given.

    Schema is DECLARED, never inferred: inference runs an extra full
    scan of the data (a non-starter at corpus scale) and silently
    drifts types between drops; a declared schema makes malformed rows
    surface as nulls (Spark's PERMISSIVE mode) where a quality filter
    catches them, and n_chars is recomputed when the source omits it.
    Every reader is a plain distributed `spark.read` — partitioned by
    input files, no driver-side parsing."""
    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        fmt = {
            ".parquet": "parquet",
            ".jsonl": "jsonl",
            ".json": "jsonl",
            ".csv": "csv",
        }.get(ext)
        if fmt is None:
            raise ValueError(f"cannot infer format from {path!r}; pass fmt=")
    if fmt == "parquet":
        # cast through the canonical types too: a drop written with
        # int32 ids must not leak a narrower schema downstream
        df = spark.read.parquet(path)
        for col, typ in (("doc_id", "bigint"), ("text", "string"), ("n_chars", "bigint")):
            if col in df.columns:
                df = df.withColumn(col, F.col(col).cast(typ))
    elif fmt == "jsonl":
        df = spark.read.schema(DOCUMENTS_DDL).json(path)
    elif fmt == "csv":
        df = spark.read.schema(DOCUMENTS_DDL).option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported documents format: {fmt!r}")
    for col, typ in (("lang", "string"), ("source", "string")):
        if col not in df.columns:
            df = df.withColumn(col, F.lit(None).cast(typ))
    df = df.withColumn(
        "n_chars",
        F.coalesce(
            F.col("n_chars") if "n_chars" in df.columns else F.lit(None).cast("long"),
            F.length("text").cast("long"),
        ),
    )
    return df.select("doc_id", "text", "lang", "source", "n_chars")
