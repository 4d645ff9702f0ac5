"""End-to-end pretraining-data curation pipeline — the composition a
user of the reference engine runs after switching to this repo.

    raw drop (parquet/JSONL/CSV)
      → quality gate            (operators.text.quality_features)
      → exact dedup             (operators.dedup.exact_dedup keep-list)
      → MinHash near-dup prune  (operators.dedup.near_dup_clusters:
                                 keep one doc per near-dup cluster)
      → decontamination         (operators.dedup.decontaminate)
      → sequence packing        (operators.text.pack_sequences)
      → Iceberg table           (distributed-snapshot append)

Every stage is a DataFrame transformation; nothing is collected to the
driver except the final accounting counts (one number per stage). At
100 TB the stages chain into Spark jobs whose shuffles are exactly the
ones inventoried in SCALE.md — the pipeline adds no driver-side loops
of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    benchmark_max_id: int | None = None,
    warehouse: str | None = None,
    near_dup_threshold: float = 0.5,
    seq_len: int = 2048,
) -> dict:
    """Run the curation pipeline over a `documents`-shaped frame.
    Returns per-stage accounting; when `warehouse` is given, the curated
    corpus is also committed to an Iceberg table `db.curated` there."""
    from iceberg_go_distributed_spark.operators import dedup as D
    from iceberg_go_distributed_spark.operators import text as T

    counts = {"input": docs.count()}
    retained = []  # persisted stage outputs, released on return

    def _stage(frame, label):
        # each stage's count AND the next stage's input read the SAME
        # materialization: without the persist, every downstream action
        # would re-execute the whole upstream chain (the MinHash stage
        # alone would otherwise run ~4 extra times by the final append)
        frame = frame.persist()
        retained.append(frame)
        counts[label] = frame.count()
        return frame

    # 1. quality gate — map-only, JVM-side
    quality = T.quality_features(docs)
    kept_ids = quality.where(F.col("keep")).select("doc_id")
    docs = _stage(docs.join(kept_ids, "doc_id"), "after_quality")

    # 2. exact dedup — keep the min-id doc of every normalized-text group
    keep = D.exact_dedup(docs).select(F.col("kept_doc_id").alias("doc_id"))
    docs = _stage(docs.join(keep, "doc_id"), "after_exact_dedup")

    # 3. near-dup prune — keep the cluster representative (min id per
    #    connected component of the verified MinHash pair graph)
    clusters = D.near_dup_clusters(docs, threshold=near_dup_threshold)
    drop = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs = _stage(docs.join(drop, "doc_id", "left_anti"), "after_near_dedup")

    # 4. decontamination — drop docs sharing shingles with the benchmark
    #    (docs with id < benchmark_max_id stand in for the eval set)
    if benchmark_max_id is not None:
        contaminated = D.decontaminate(
            docs, benchmark_max_id=benchmark_max_id
        ).select("doc_id")
        docs = _stage(
            docs.join(contaminated, "doc_id", "left_anti"), "after_decontamination"
        )
    else:
        counts["after_decontamination"] = counts["after_near_dedup"]

    # 5. sequence packing — where each doc lands in the token stream
    packed = T.pack_sequences(docs, seq_len=seq_len)
    counts["total_tokens"] = packed.agg(
        F.sum("n_tokens").cast("long").alias("t")
    ).first().t
    counts["n_sequences"] = int(-(-counts["total_tokens"] // seq_len))

    # 6. commit the curated corpus to an Iceberg table
    if warehouse is not None:
        from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
        from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

        cat = FileSystemCatalog(warehouse)
        t = cat.create_table("db.curated", schema_from_spark(docs.schema))
        t.append(docs)
        counts["committed_rows"] = t.scan().count(spark)
    for frame in retained:
        frame.unpersist()
    return counts
