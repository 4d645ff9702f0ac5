"""The examples/pretraining_pipeline.py composition, run for real at
test SF: accounting must be monotone non-increasing through the
filtering stages, the curated table must commit and scan back, and the
near-dup stage must keep exactly one representative per cluster."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_pipeline_end_to_end(tmp_path, spark, sf_dir):
    from pretraining_pipeline import run_pipeline

    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog

    docs = load_table(spark, sf_dir, "documents")
    counts = run_pipeline(
        spark,
        docs,
        benchmark_max_id=5,
        warehouse=str(tmp_path / "wh"),
        seq_len=256,
    )

    # filtering stages only ever shrink the corpus
    chain = [
        counts["input"],
        counts["after_quality"],
        counts["after_exact_dedup"],
        counts["after_near_dedup"],
        counts["after_decontamination"],
    ]
    assert chain == sorted(chain, reverse=True)
    assert counts["after_decontamination"] > 0
    # near-dup stage did real work at this SF (planted dup families)
    assert counts["after_near_dedup"] < counts["after_exact_dedup"]

    # packing accounting is self-consistent
    assert counts["n_sequences"] >= counts["total_tokens"] // 256
    assert counts["total_tokens"] > 0

    # the curated corpus committed and scans back through the table layer
    assert counts["committed_rows"] == counts["after_decontamination"]
    t = FileSystemCatalog(str(tmp_path / "wh")).load_table("db.curated")
    assert t.scan().to_df(spark).count() == counts["committed_rows"]
