"""Delete-stream maintenance loop — keeping a merge-on-read v3 table
healthy under continuous row-level deletes.

The operational pattern a 100 TB curation table runs: GDPR/right-to-be-
forgotten or label-correction deletes arrive continuously as
`delete_where` calls (each writes puffin deletion vectors — no data
rewrite, O(matched rows) work). Left alone, two things degrade:

  1. DV *scatter* — every delete round leaves its live DVs in fresh
     puffin files, so scans open ever more tiny delete files.
     `rewrite_position_deletes` repacks all live DV blobs into
     target-size puffins WITHOUT touching data files or re-deriving a
     single delete (sequence numbers preserved → scan gating
     bit-identical). Cheap: O(deleted positions) executor work.
  2. Delete *debt* — once a file's DV covers a large fraction of its
     rows, merge-on-read pays for rows it always drops.
     `rewrite_data_files` (compaction) rewrites data net of deletes
     and clears the DVs — expensive but terminal.

The loop below applies the cheap pass every round and the expensive one
only when delete debt crosses a threshold — the standard two-tier
maintenance policy (Iceberg's rewrite_position_deletes /
rewrite_data_files procedure pair; ref table/properties.go delete-file
sizing intent).
"""

from __future__ import annotations


def delete_debt(table) -> float:
    """Deleted-position count over live rows, from snapshot summary
    counters alone (no Spark job, no file reads)."""
    s = table.current_snapshot()
    if s is None:
        return 0.0
    props = s.summary.properties
    total = int(props.get("total-records", "0"))
    deleted = int(props.get("total-position-deletes", "0"))
    return deleted / total if total else 0.0


def equality_debt(table) -> int:
    """Outstanding equality-delete rows, from summary counters alone.
    Unlike position deletes (bitmap skips), every equality delete costs
    a keyed anti-join per read until converted or compacted away."""
    s = table.current_snapshot()
    if s is None:
        return 0
    return int(s.summary.properties.get("total-equality-deletes", "0"))


def maintain(table, spark, compact_at: float = 0.3, convert_eq_at: int = 1) -> str:
    """One maintenance tick. Returns which tier ran: 'converted',
    'consolidated', 'compacted', or 'noop'.

    Three tiers, cheapest first beneath the compaction gate:
      - equality deletes (from upsert/MERGE streams) convert to DVs as
        soon as any accumulate — each one taxes EVERY read with an
        anti-join, and conversion is one pass over affected files;
      - DV scatter consolidates every tick (O(deleted positions));
      - full compaction only past the delete-debt threshold."""
    if delete_debt(table) >= compact_at:
        if table.rewrite_data_files(spark):
            # compaction materializes the deletes but leaves the (now
            # dangling) DV entries in the delete manifests; the cheap
            # pass sweeps them so the debt counters drop to zero
            table.rewrite_position_deletes(spark)
            return "compacted"
    if equality_debt(table) >= convert_eq_at:
        if table.convert_equality_deletes(spark):
            return "converted"
    if table.rewrite_position_deletes(spark):
        return "consolidated"
    return "noop"
