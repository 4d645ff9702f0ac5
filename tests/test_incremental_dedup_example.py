"""examples/incremental_dedup.py: cross-batch near-dedup against a
persisted Iceberg signature index — batch-only compute, exact-verified
rejections, idempotent replay."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the rain taps gently on the glass pane"
)
OTHER = (
    "completely different subject matter entirely about distributed "
    "query engines shuffling partitioned columnar data across executors"
)
THIRD = (
    "a third unrelated passage describing mountain trails winding "
    "through pine forests toward a granite summit under morning fog"
)


def test_incremental_dedup_across_batches(tmp_path, spark):
    from incremental_dedup import create_index, process_batch

    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.operators.dedup import minhash_near_dups

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    b1 = _mk_docs(spark, [(1, BASE), (2, OTHER)])
    corpus = cat.create_table("db.corpus", schema_from_spark(b1.schema))
    index = create_index(cat, "db.dedup_index")

    # batch 1: two distinct docs, empty index → both accepted
    acc, rej = process_batch(index, corpus, b1, spark)
    assert (acc, rej) == (2, 0)
    assert corpus.scan().to_df(spark).count() == 2
    assert index.scan().to_df(spark).count() == 2

    # batch 2: near-dup of doc 1 (one word changed), an in-batch dup
    # pair (4 ≈ 5), and one genuinely new doc
    b2 = _mk_docs(
        spark,
        [
            (3, BASE.replace("lazy", "sleepy")),   # ≈ corpus doc 1 → reject
            (4, THIRD),                            # new → accept
            (5, THIRD + " extra"),                 # ≈ in-batch doc 4 → reject
            (6, "short standalone unique snippet about sailing boats at dusk"),
        ],
    )
    acc, rej = process_batch(index, corpus, b2, spark)
    assert (acc, rej) == (2, 2)
    ids = sorted(r.doc_id for r in corpus.scan().to_df(spark).collect())
    assert ids == [1, 2, 4, 6]
    # the final corpus holds NO near-dup pair at the threshold
    assert (
        minhash_near_dups(corpus.scan().to_df(spark), threshold=0.5).count() == 0
    )

    # replay batch 2 (crash-retry): upsert + self-exclusion make it
    # converge — every doc now dups the corpus (incl. its own copy)
    acc2, rej2 = process_batch(index, corpus, b2, spark)
    assert (acc2, rej2) == (0, 4)
    assert sorted(r.doc_id for r in corpus.scan().to_df(spark).collect()) == ids
    assert index.scan().to_df(spark).count() == 4


def test_crash_between_corpus_and_index_heals_on_replay(tmp_path, spark):
    """Simulate the crash window: survivors landed in the corpus but the
    index upsert never ran. Replay must repair the index (so future
    near-dups of those docs are caught) without re-appending."""
    from incremental_dedup import create_index, process_batch

    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    b1 = _mk_docs(spark, [(1, BASE), (2, OTHER)])
    corpus = cat.create_table("db.corpus", schema_from_spark(b1.schema))
    index = create_index(cat, "db.dedup_index")

    # crash simulation: docs reach the corpus, the index write is lost
    corpus.append(b1)
    assert index.scan().to_df(spark).count() == 0

    # replay of the same batch: nothing re-appended, index repaired
    acc, rej = process_batch(index, corpus, b1, spark)
    assert (acc, rej) == (0, 2)
    assert corpus.scan().to_df(spark).count() == 2
    assert index.scan().to_df(spark).count() == 2

    # and the repaired index now catches near-dups of the healed docs
    b2 = _mk_docs(spark, [(3, BASE.replace("dog", "hound"))])
    acc, rej = process_batch(index, corpus, b2, spark)
    assert (acc, rej) == (0, 1)
