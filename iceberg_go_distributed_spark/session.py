"""SparkSession construction tuned for the engine.

Defaults are chosen for large-scale execution (AQE on, skew-join handling,
zstd parquet, broadcast threshold sized for dimension tables) while staying
correct on local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime (non-static) SQL confs applied to any session we are handed,
# including driver-owned sessions passed into __spark_entry__.entry().
RUNTIME_CONFS = {
    # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    # reader rejects; read as long ns and convert (datasets.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Coalesce post-shuffle partitions to the advisory byte size instead
    # of stopping at default parallelism (Spark's own docs recommend
    # false): reduce stages get partitions sized for the DATA, so a
    # KB-sized aggregate is 1 task, not 32 — and at 100 TB the advisory
    # size (64 MB) is what bounds reducer memory anyway.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # the table layer resolves parquet columns by the field ids it writes
    # (rename-safe reads); engine-level on purpose — documented in README
    "spark.sql.parquet.fieldId.read.enabled": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # bigger Arrow batches: fewer JVM<->Python roundtrips in the
    # mapInArrow write path and larger parquet row groups per write call
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # dimension tables (region/nation/customer/supplier/part at test SFs)
    # should broadcast; at 100 TB the big fact tables never fit here anyway.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session. Failures are
    recorded on the session (`_failed_runtime_confs`) so downstream
    loaders can raise a clear error near the cause instead of an obscure
    reader failure (ADVICE: nanosAsLong vs events TIMESTAMP(NANOS))."""
    failed: list[str] = []
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            failed.append(k)  # static conf on this build — builder sets it
    spark._failed_runtime_confs = failed
    return spark


def build_spark(
    app_name: str = "iceberg-go-distributed-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 32)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
