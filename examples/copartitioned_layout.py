"""Co-partitioned layout recipe — pay the clustering shuffle ONCE at
write time, then run every join / rollup / as-of attribution on that
key with ZERO table exchange.

The pattern a feature-store or training-data join farm runs: the fact
and dimension tables are written `bucket[N]` on the entity key (the
one clustering shuffle each), after which

  - fact ⋈ dim            → storage_partitioned_join   (per-bucket task)
  - per-entity rollups    → storage_partitioned_agg    (final aggs, no
                            partial/merge pass)
  - point-in-time labels  → storage_partitioned_asof_join (no keyed
                            exchange, the classic leakage-safe
                            feature-label pairing)
  - decontamination       → how='anti' (probe reads the key column only)

At 100 TB the shuffle this removes is the single largest network cost
in the pipeline; SCALE.md's round-11 probe measures 3.6-3.9× over the
forced-shuffle join at 8-32M rows on one box, and the gap widens with
cluster size because only task descriptors move.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_go_distributed_spark.iceberg.partitioning import spec_from
from iceberg_go_distributed_spark.iceberg.types import schema_from_spark


def write_copartitioned(catalog, name: str, df, key: str, buckets: int = 32):
    """One clustering write: bucket[N] fanout on the entity key."""
    schema = schema_from_spark(df.schema)
    spec = spec_from(schema, (key, f"bucket[{buckets}]"))
    t = catalog.create_table(f"db.{name}", schema, spec=spec)
    t.append(df)
    return t


def entity_features(spark, facts, dims, entity_key=("f_entity", "d_entity")):
    """fact ⋈ dim enrichment + per-entity rollup, both exchange-free."""
    enriched = facts.storage_partitioned_join(
        spark,
        dims,
        on=entity_key,
        left_select=[entity_key[0], "f_value"],
        right_select=[entity_key[1], "d_segment"],
    )
    rollup = facts.storage_partitioned_agg(
        spark,
        on=entity_key[0],
        aggs={
            "n_events": ("f_value", "count"),
            "total": ("f_value", "sum"),
            "peak": ("f_value", "max"),
        },
    )
    return enriched, rollup


def point_in_time_labels(spark, labels, features, entity_key, label_ts, feature_ts):
    """Leakage-safe feature attachment: each label row takes the most
    recent feature row at-or-before its timestamp, same entity."""
    return labels.storage_partitioned_asof_join(
        spark,
        features,
        on=entity_key,
        left_ts=label_ts,
        right_ts=feature_ts,
        right_cols=["f_value"],
        direction="backward",
    )


def decontaminate(spark, corpus, benchmark, key=("doc_key", "bench_key")):
    """Anti probe: corpus rows whose key appears in the benchmark are
    dropped; only the benchmark's key column is ever read."""
    return corpus.storage_partitioned_join(spark, benchmark, on=key, how="anti")


def star_features(spark, fact, *dims):
    """fact ⋈ dim₁ ⋈ … ⋈ dimₖ in ONE task pass — chaining two-way joins
    would shuffle after the first. Each dim is (table, key, select)."""
    from iceberg_go_distributed_spark.iceberg.spj import (
        storage_partitioned_star_join,
    )

    sides = [{"table": fact[0], "key": fact[1], "select": fact[2]}]
    sides += [{"table": t, "key": k, "select": s} for (t, k, s) in dims]
    return storage_partitioned_star_join(spark, sides)


def demo(spark, catalog, facts_df, dims_df):
    tf = write_copartitioned(catalog, "facts", facts_df, "f_entity")
    td = write_copartitioned(catalog, "dims", dims_df, "d_entity")
    enriched, rollup = entity_features(spark, tf, td)
    return (
        enriched.groupBy("d_segment").agg(F.count("*").alias("n")),
        rollup,
    )


def rollup_per_entity(spark, fact, dim, entity_key=("f_entity", "d_entity")):
    """Round-12: join + FINAL per-entity aggregate in one task pass —
    `storage_partitioned_join(...).groupBy(key)` would re-shuffle the
    co-located rows; the fused operator never lets them leave the
    bucket task (1.8× measured at 8M rows, SCALE.md r12)."""
    return fact.storage_partitioned_join_agg(
        spark,
        dim,
        on=entity_key,
        aggs={"n": ("f_value", "count"), "total": ("f_value", "sum")},
        group_keys=[entity_key[0], "d_segment"],
    )


def sync_from_upstream(spark, target, source_table, key="f_entity"):
    """Round-12: MERGE with a co-partitioned TABLE source routes every
    join through SPJ task passes — zero exchange or broadcast of either
    side (2.0× vs the broadcast path at 8M⋈800k, SCALE.md r12). The
    same call with a DataFrame source (or an incompatible layout) runs
    the regular broadcast/AQE path — the API is identical.
    Requires the key column REQUIRED (non-null) on both sides."""
    return target.merge(
        spark,
        source_table,
        on=[key],
        matched_update="*",
        not_matched_insert=True,
        not_matched_by_source_delete=True,
    )


def star_rollup(spark, fact, dims, group_cols):
    """Round-12: N-way star join with the aggregate fused into the same
    task pass — star_features(...).groupBy(...) would re-shuffle the
    co-located star output (1.4× measured at 8M rows, SCALE.md r12)."""
    from iceberg_go_distributed_spark.iceberg.spj import (
        storage_partitioned_star_join,
    )

    sides = [{"table": fact[0], "key": fact[1], "select": fact[2]}]
    sides += [{"table": t, "key": k, "select": s} for (t, k, s) in dims]
    return storage_partitioned_star_join(
        spark,
        sides,
        aggs={"n": (fact[2][1], "count"), "total": (fact[2][1], "sum")},
        group_keys=group_cols,
    )
