"""Incremental cross-batch near-dedup — the ingestion shape a 100 TB
training-data pipeline actually runs.

One-shot `minhash_near_dups` re-shingles the WHOLE corpus every run;
at ingestion time only the new batch should pay compute. This example
keeps a persisted MinHash *signature index* in an Iceberg table
(`<ns>.dedup_index`, one row per accepted doc: doc_id, n_shingles, the
NUM_PERMS signature columns) and, per incoming batch:

  1. shingles + signs ONLY the batch (O(batch), never O(corpus));
  2. LSH-bands the batch AND the index scan (band keys derive from the
     stored signature columns map-side — the index never re-shingles),
     joins on (band_idx, band_key) with the Jaccard length filter;
  3. exact-verifies candidates by joining the few candidate old docs
     back to the corpus table for their shingle sets — O(candidates)
     re-shingling, not O(corpus);
  4. rejects batch docs near-duplicating the corpus (or an earlier
     in-batch doc), appends survivors to the corpus table and UPSERTS
     their signatures into the index. Replay is idempotent AND
     self-healing: the corpus is the authority for "already ingested"
     (skipped up front), and docs present in the corpus but missing
     from the index — the crash window between the two table writes —
     get their signatures re-upserted before anything else.

Scale shape: the corpus-sized work is the index table SCAN feeding the
band join (columnar, NUM_PERMS+2 longs per doc) and the corpus doc_id
projection for the replay/repair checks (one column); the shuffle is
the band-key exchange, spread across NUM_BANDS per-doc rows.
Everything else is O(batch + candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from iceberg_go_distributed_spark.operators.dedup import (
    BAND_ROWS,
    NUM_BANDS,
    NUM_PERMS,
    minhash_signatures,
    shingle_sets,
)

SIG_COLS = [f"m{i}" for i in range(NUM_PERMS)]


def _bands(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    keys = [
        F.xxhash64(F.lit(j), *[F.col(f"m{j * BAND_ROWS + r}") for r in range(BAND_ROWS)])
        for j in range(NUM_BANDS)
    ]
    return sig.select(
        F.col(id_col),
        "_n_shingles",
        F.posexplode(F.array(*keys)).alias("band_idx", "band_key"),
    )


def create_index(catalog, name: str):
    """The signature index table: one row per accepted doc."""
    from iceberg_go_distributed_spark.iceberg.types import (
        LongType,
        NestedField,
        Schema,
    )

    fields = [
        NestedField(1, "doc_id", LongType(), required=True),
        NestedField(2, "_n_shingles", LongType()),
    ] + [NestedField(3 + i, c, LongType()) for i, c in enumerate(SIG_COLS)]
    return catalog.create_table(name, Schema.of(0, *fields))


def process_batch(
    index_table,
    corpus_table,
    batch: DataFrame,
    spark,
    threshold: float = 0.5,
    n: int = 3,
) -> tuple[int, int]:
    """Dedup `batch` against the corpus (and itself), append survivors,
    upsert their signatures. Returns (accepted, rejected) counts."""
    sh = shingle_sets(batch, "text", "doc_id", n).persist()
    sig = minhash_signatures(sh, "doc_id").persist()
    try:
        index_df = index_table.scan().to_df(spark)
        have_index = index_df.count() > 0

        # replay safety: a doc_id already in the CORPUS was ingested by
        # a previous (possibly crashed) run of this batch — skip it so
        # re-runs converge instead of re-appending. The corpus is the
        # authority: a crash BETWEEN the corpus append and the index
        # upsert leaves corpus rows without signatures, so replay also
        # REPAIRS the index for exactly those docs (otherwise their
        # future near-duplicates would sail past the band join forever).
        corpus_ids = corpus_table.scan().to_df(spark).select("doc_id")
        fresh = batch.join(corpus_ids, "doc_id", "left_anti")
        if have_index:
            gap = (
                batch.select("doc_id")
                .join(corpus_ids, "doc_id")
                .join(index_df.select("doc_id"), "doc_id", "left_anti")
            )
        else:
            gap = batch.select("doc_id").join(corpus_ids, "doc_id")
        gap_sigs = sig.join(gap, "doc_id").select("doc_id", "_n_shingles", *SIG_COLS)
        if gap_sigs.count():
            index_table.upsert(gap_sigs, ["doc_id"])
            index_df = index_table.scan().to_df(spark)
            have_index = True
        fresh_sig = sig.join(fresh.select("doc_id"), "doc_id")
        new_bands = _bands(fresh_sig)

        # candidates vs the corpus: band join + length filter.
        cand = None
        if have_index:
            old_bands = _bands(index_df).select(
                F.col("doc_id").alias("old_id"),
                F.col("_n_shingles").alias("_n_old"),
                "band_idx",
                "band_key",
            )
            na, nb = F.col("_n_shingles"), F.col("_n_old")
            cand = (
                new_bands.join(old_bands, ["band_idx", "band_key"])
                .where((na * 1.0 / nb >= threshold) & (nb * 1.0 / na >= threshold))
                .select("doc_id", "old_id")
                .distinct()
            )

        rejected_ids = None
        if cand is not None:
            # exact verification: re-shingle ONLY the candidate old docs
            old_docs = corpus_table.scan().to_df(spark).join(
                cand.select(F.col("old_id").alias("doc_id")).distinct(), "doc_id"
            )
            old_sh = shingle_sets(old_docs, "text", "doc_id", n).select(
                F.col("doc_id").alias("old_id"), F.col("shingles").alias("_so")
            )
            new_sh = sh.select("doc_id", F.col("shingles").alias("_sn"))
            jac = F.size(F.array_intersect("_sn", "_so")) / F.size(
                F.array_union("_sn", "_so")
            )
            rejected_ids = (
                cand.join(new_sh, "doc_id")
                .join(old_sh, "old_id")
                .where(jac >= threshold)
                .select("doc_id")
                .distinct()
            )

        survivors = fresh
        if rejected_ids is not None:
            survivors = fresh.join(rejected_ids, "doc_id", "left_anti")

        # in-batch dedup among survivors: keep the smallest doc_id of
        # each near-dup pair (one banded self-join, batch-sized)
        s_sig = sig.join(survivors.select("doc_id"), "doc_id")
        sb = _bands(s_sig)
        a, b = sb.alias("a"), sb.alias("b")
        na, nb = F.col("a._n_shingles"), F.col("b._n_shingles")
        pair = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .where((na * 1.0 / nb >= threshold) & (nb * 1.0 / na >= threshold))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("_sa"))
        s2 = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("_sb"))
        jac2 = F.size(F.array_intersect("_sa", "_sb")) / F.size(
            F.array_union("_sa", "_sb")
        )
        in_batch_losers = (
            pair.join(sa, "doc_a").join(s2, "doc_b")
            .where(jac2 >= threshold)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        survivors = survivors.join(in_batch_losers, "doc_id", "left_anti")

        n_total = batch.count()
        n_acc = survivors.count()

        if n_acc:
            corpus_table.append(survivors)
            index_table.upsert(
                sig.join(survivors.select("doc_id"), "doc_id").select(
                    "doc_id", "_n_shingles", *SIG_COLS
                ),
                ["doc_id"],
            )
        return n_acc, n_total - n_acc
    finally:
        sh.unpersist()
        sig.unpersist()
