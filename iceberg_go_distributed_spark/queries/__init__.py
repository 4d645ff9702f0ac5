"""Query registry: every implemented operator/query exposes

  - a Spark callable  ``(spark, sf_dir) -> DataFrame``
  - optionally an ANSI-SQL oracle string DuckDB runs on the same parquet
    tables (pre-registered views region nation customer supplier part
    orders lineitem events documents embeddings).

Column names are aliased identically on both sides; money arithmetic is
done in exact DECIMAL on both sides and cast to DOUBLE at the end so the
driver's value-hash matches bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# ---- shared exact-arithmetic SQL fragments (identical text on both engines)
# money columns fit DECIMAL(12,2); discount/tax < 1 fit DECIMAL(4,2).
REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
SUM_REV = f"CAST(SUM({REV}) AS DOUBLE)"
CHARGE = f"CAST({REV} AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(4,2)))"


def sum_d(col: str, alias: str) -> str:
    """Exact decimal SUM rendered to double."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(12,2))) AS DOUBLE) AS {alias}"


# The correctness driver evaluates only the FIRST 50 registry entries per
# round, so ordering is part of the verification contract.  The priority
# list below front-loads the table-layer (`ice_*`) and curation (`llm_*`)
# oracles — the components whose only hard signal is a driver row — plus
# the core event-analytics shapes and a representative TPC-H slice.  The
# tail (10 TPC-H queries + ev_sliding_rollup) has been driver-green for
# five consecutive rounds and remains fully covered by the local DuckDB
# oracle suite (tests/test_queries_oracle.py), which runs ALL entries.
_PRIORITY = [
    # Iceberg table layer — scan, prune, time travel, write plane, v3.
    # ice_write_scan_filter rotated r13 (ELEVEN consecutive driver-green
    # rounds r2–r12; it stays a BENCH headline timed every round and the
    # local oracle keeps verifying its values) — its slot admits the new
    # wide-scan read routes (streaming plan→read, collected wide read,
    # in-prune-job count) so the r13 scan-execution work gets a driver
    # row in its first round.
    "ice_wide_scan",
    # ice_partition_prune rotated r8 (six driver-green rounds r2–r7;
    # ice_partition_evolution asserts the same transform-aware pruning
    # in-query, now across TWO specs) — slot admits partition evolution.
    "ice_partition_evolution",
    "ice_prune_soundness",
    # ice_time_travel rotated r8 (six driver-green rounds r2–r7; its
    # snapshot-id/tag reads stay covered by the local oracle and the WAP
    # branch tests) — its slot admits the new multi-action MERGE so the
    # DML surface gets a driver row in round one.
    "ice_merge",
    # ice_snapshot_summary rotated r8 (six driver-green rounds r2–r7;
    # the running total-* counters are additionally fuzzed against full
    # manifest recomputation) — slot admits the new metadata-only
    # MIN/MAX fold, the other §2.4 metadata-aggregate shape.
    "ice_metadata_minmax",
    # ice_bucket_partitioning rotated r8 (six driver-green rounds r2–r7;
    # the murmur3 bucket transform stays pinned by golden-value pytest
    # and the local oracle) — its slot admits the new z-order layout
    # rewrite so the clustering feature gets a driver row in round one.
    "ice_zorder_prune",
    # ice_positional_deletes rotated r8 (six driver-green rounds r2–r7;
    # positional-delete matching stays driver-covered in-window by
    # ice_deletion_vector and ice_partitioned_write_mor) — slot admits
    # the new equality→DV conversion so its exactness gets a driver row.
    "ice_eq_convert",
    "ice_overwrite",
    "ice_equality_deletes",
    "ice_nan_roundtrip",
    # ice_upsert rotated r11 (driver-green r2–r10; upsert IS a
    # two-clause MERGE, whose in-window ice_merge row pins the same
    # equality-delete + re-append pipeline with strictly more clauses)
    # — its slot admits the new storage-partitioned join so the
    # zero-exchange bucket join gets a driver row in round one.
    "ice_spj",
    "ice_deletion_vector",
    "ice_v3_write",
    "ice_row_lineage",
    "ice_theta_ndv",
    "ice_changelog",
    "ice_incremental_scan",
    "ice_partitions_table",
    # New r7: the production write/read round trip (fanout partitioned
    # v3 append → delete_where DVs → pruned MOR scan) — also a BENCH
    # headline entry. q18_large_volume_customers (six rounds
    # driver-green; its semi-join-on-agg + fact⋈fact exchange is
    # verified by the local oracle suite every round) yields its slot.
    "ice_partitioned_write_mor",
    # New r8: the CDC readStream source (mode='cdc') with a full SQL
    # oracle — every appended row is an 'insert', every row the DV named
    # is a 'delete'. ev_hourly_rollup (six rounds driver-green, measured
    # in BENCH every round; see ROTATED_OUT) yields its slot.
    "ice_stream_cdc",
    # LLM-data-pipeline curation operators.
    # llm_dedup_fingerprint (five rounds driver-green, the same
    # hash-groupBy shape as llm_dedup_exact) yields its slot to the new
    # corpus-ngram audit so it gets a driver row.
    "llm_dedup_exact",
    "llm_dedup_minhash",
    # llm_dedup_simhash + llm_ngram_topk rotated r12 (TEN consecutive
    # driver-green rounds each, r2-r11; simhash's pigeonhole bucket-join
    # near-dup stays value-pinned by the local oracle and its golden
    # pytest, ngram machinery stays in-window via llm_corpus_ngrams) —
    # their slots admit the two of the four never-driver-verified TPC-H
    # queries (q2, q11) so the bar "every operator has a CORRECTNESS
    # row" closes with zero exceptions (VERDICT r11 task 1).
    "llm_decontaminate",
    "llm_sample_stratified",
    "llm_pack_sequences",
    "llm_ann_bruteforce",
    "llm_ann_ivf_trained",
    "llm_ann_lsh",
    # llm_token_stats (five rounds driver-green, a plain map-only
    # aggregate whose accounting quality_filter strictly extends) and
    # llm_doc_fingerprints (five rounds green, the same md5-map shape as
    # llm_dedup_exact) yield their slots to the never-driver-verified
    # PII scan and term co-occurrence.
    "llm_pii_scan",
    "llm_term_cooccurrence",
    "llm_quality_filter",
    # llm_langid_accuracy rotated r12 (ten driver-green rounds r2-r11;
    # the n-gram language-ID heuristic keeps its accuracy-floor pytest
    # and local oracle) — slot admits q16.
    "llm_multimodal_features",
    "llm_frame_sample",
    "llm_dedup_embedding",
    "llm_dedup_clusters",
    "llm_repetition_stats",
    "llm_top_terms",
    "llm_corpus_ngrams",
    # Event analytics core (ev_hourly_rollup rotated out r8 — six rounds
    # driver-green AND measured in BENCH every round; ledger below.
    # sliding rollup shares machinery with hourly;
    # ev_top_users_by_purchase — five rounds driver-green, a plain
    # agg+topk subsumed by q18's shape — yields its slot to the new
    # funnel so every never-driver-verified operator has a driver row).
    # (ev_latest_per_user — five rounds green, a plain max-window shape
    # covered by ev_sessionization's window machinery — yields its slot
    # to the new retention operator.)
    # ev_sessionization rotated r8 (six driver-green rounds r2–r7; its
    # batch session-window values stay pinned by the local oracle AND by
    # the stream/batch parity test backing ev_stream_sessionize, which
    # remains in-window).
    # ev_skew_salted_agg (six rounds driver-green; its salted two-phase
    # agg shape is covered locally every round) and q9_product_profit
    # (five rounds green; q18 covers the fact⋈fact exchange and q1 the
    # wide agg) yield their slots to the round-6 statistics operators
    # ev_value_quantiles / ev_value_histogram — the only oracle-backed
    # operators that had never had a driver row.
    # ev_stream_sessionize rotated r12: it is permanently `no_oracle`
    # (session windows are not SQL-expressible), so it occupied a window
    # slot that could never go hash-green while oracle-bearing queries
    # had no driver row. Its verification home is the stream/batch
    # parity pytest (tests/test_streaming.py), documented in the ledger
    # below — the window is now 100% oracle-bearing.
    "ev_asof_attribution",
    "ev_range_count",
    "ev_funnel",
    "ev_retention_cohorts",
    "ev_value_quantiles",
    "ev_value_histogram",
    # TPC-H representative slice. q3/q5/q9/q13/q18 moved to the
    # locally-verified tail after five-plus consecutive driver-green
    # rounds, alongside llm_ann_ivf (subsumed by llm_ann_ivf_trained —
    # same cell-scan read path, trained centroids), to keep
    # never-driver-verified operators inside the 50-entry window.
    # q1_pricing_summary rotated r8 (six driver-green rounds r2–r7,
    # still a BENCH headline timed every round) so the two NEW adapted
    # queries — q12 (fact⋈fact + conditional counts) and q21 (the
    # double-correlated exists/not-exists rewritten as one keyed
    # aggregate) — each get a driver row in their first round.
    "q12_late_priority_lines",
    "q21_suppliers_kept_waiting",
    # New r12: the four adapted TPC-H queries added in r8-s2 that had
    # never appeared in any CORRECTNESS window (VERDICT r11 "What's
    # missing" #3). Local oracle green since r8; these rows close the
    # "every operator has a driver row" bar.
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_part_supplier_relation",
    "q20_dominant_suppliers",
]


# ------------------------------------------------------------ rotation ledger
# Entries rotated OUT of the driver's 50-row verification window, as DATA
# so the policy is mechanically auditable (tests/test_queries_oracle.py
# validates every clause below against the recorded CORRECTNESS_r*.json
# artifacts):
#   1. an entry may leave the window only with >= ROTATION_MIN_GREEN
#      consecutive driver-green rounds immediately before its rotation
#      round, OR a `subsumed_by` pointer to an IN-window entry with the
#      same execution shape;
#   2. every rotated entry stays registered, so the local DuckDB oracle
#      suite still verifies it each round (test_query_matches_oracle
#      parameterizes over ALL entries, not the window);
#   3. `why` records the rationale next to the entry it justifies.
ROTATION_MIN_GREEN = 4

def _r(since_round, subsumed_by, why):
    return {"since_round": since_round, "subsumed_by": subsumed_by, "why": why}

ROTATED_OUT: dict[str, dict] = {
    # round 6 rotations — TPC-H slice, driver-green r2–r5
    "q3_shipping_priority": _r(6, None, "dims-broadcast fact join; 4 green rounds, local oracle every round"),
    "q4_order_priority": _r(6, None, "semi-join exists; 4 green rounds"),
    "q5_local_supplier_volume": _r(6, None, "multi-dim broadcast join chain; 4 green rounds"),
    "q6_forecast_revenue": _r(6, None, "scan-filter agg; 4 green rounds; also a BENCH headline"),
    "q7_volume_shipping": _r(6, None, "two-nation join with year split; 4 green rounds"),
    "q8_market_share": _r(6, None, "market-share ratio agg; 4 green rounds"),
    "q10_returned_items": _r(6, None, "returned-items top-k agg; 4 green rounds"),
    "q13_customer_distribution": _r(6, None, "outer-join distribution; 4 green rounds; BENCH headline"),
    "q14_promo_effect": _r(6, None, "conditional-ratio agg; 4 green rounds"),
    "q15_top_supplier": _r(6, None, "agg + max-subquery; 4 green rounds"),
    "q17_small_qty_revenue": _r(6, None, "per-part avg correlated filter; 4 green rounds"),
    "q19_discounted_revenue": _r(6, None, "disjunctive predicate pushdown; 4 green rounds"),
    "q22_global_sales_opportunity": _r(6, None, "anti-join + global avg; 4 green rounds"),
    # round 6 rotations — events/llm, shape-subsumed and/or 4 green rounds
    "ev_sliding_rollup": _r(6, "ev_hourly_rollup", "same windowed-rollup machinery, sliding variant; 1 green round + shape subsumption"),
    "ev_top_users_by_purchase": _r(6, None, "plain agg+topk; 4 green rounds"),
    "ev_latest_per_user": _r(6, "ev_sessionization", "max-window shape covered by sessionization's window machinery"),
    "llm_ann_ivf": _r(6, "llm_ann_ivf_trained", "same cell-scan read path; trained variant adds centroid training on top"),
    "llm_dedup_fingerprint": _r(6, "llm_dedup_exact", "same hash-groupBy shape"),
    "llm_token_stats": _r(6, "llm_quality_filter", "map-only accounting strictly extended by quality_filter"),
    "llm_doc_fingerprints": _r(6, "llm_dedup_exact", "same md5-map shape"),
    # round 8 rotation — to admit ice_stream_cdc (the new CDC readStream
    # oracle) into the window
    "ev_hourly_rollup": _r(8, None, "windowed rollup agg; 6 driver-green rounds (r2-r7); a BENCH headline, so it stays timed every round, and the local oracle verifies values"),
    # round 8 rotations — to admit the two new adapted TPC-H queries
    # (q12_late_priority_lines, q21_suppliers_kept_waiting) into the
    # window in their first round
    "q1_pricing_summary": _r(8, None, "scan-filter wide agg; 6 driver-green rounds (r2-r7); BENCH headline, so it stays timed every round and the local oracle verifies values"),
    "ev_sessionization": _r(8, "ev_stream_sessionize", "6 driver-green rounds (r2-r7); same session-window machinery as the in-window stream variant, whose batch parity test pins these exact values"),
    # round 8 rotation — to admit ice_zorder_prune (the new z-order
    # layout-rewrite oracle) into the window
    "ice_bucket_partitioning": _r(8, None, "murmur3-bucket write+pruned scan; 6 driver-green rounds (r2-r7); the bit-exact bucket transform keeps its golden-value pytest and the local oracle verifies values every round"),
    # round 8 rotation — to admit ice_merge (the new multi-action MERGE
    # oracle) into the window
    "ice_time_travel": _r(8, None, "snapshot-id/tag/current reads; 6 driver-green rounds (r2-r7); WAP branch isolation pytest and the local oracle keep covering it every round"),
    # round 8 rotation — to admit ice_partition_evolution into the window
    "ice_partition_prune": _r(8, "ice_partition_evolution", "6 driver-green rounds (r2-r7); the evolution entry asserts the same transform-aware partition pruning in-query, across two specs"),
    # round 8 rotation — to admit ice_metadata_minmax into the window
    "ice_snapshot_summary": _r(8, None, "snapshot summary counters; 6 driver-green rounds (r2-r7); the running total-* counters are also fuzzed against full manifest recomputation every round, and the local oracle keeps verifying values"),
    # round 8 rotation — to admit ice_eq_convert into the window
    "ice_positional_deletes": _r(8, "ice_deletion_vector", "6 driver-green rounds (r2-r7); positional-delete matching stays in-window via ice_deletion_vector and the MOR round trip"),
    # round 11 rotation — to admit ice_spj (the storage-partitioned
    # join oracle) into the window in its first round
    "ice_upsert": _r(11, "ice_merge", "8 driver-green rounds (r2-r4, r6-r10; out of the r5 window); upsert is a two-clause MERGE — the in-window ice_merge row exercises the same equality-delete + re-append pipeline with strictly more clauses, and the local oracle keeps verifying upsert's values every round"),
    # round 7 rotations — driver-green r2–r6 (5 rounds)
    "ev_skew_salted_agg": _r(7, None, "salted two-phase agg, no in-window twin; 5 green rounds, local oracle every round"),
    # round 12 rotations — to admit the four never-driver-verified TPC-H
    # queries (q2, q11, q16, q20; registered r8-s2, local-oracle green
    # every round since) so every oracle-bearing operator finally has a
    # CORRECTNESS row (VERDICT r11 task 1)
    "llm_dedup_simhash": _r(12, None, "pigeonhole-chunked SimHash near-dup; 10 driver-green rounds (r2-r11); hamming-distance goldens + local oracle keep verifying values every round"),
    "llm_ngram_topk": _r(12, "llm_corpus_ngrams", "10 driver-green rounds (r2-r11); the in-window corpus-ngram audit exercises the same explode+count ngram machinery corpus-wide"),
    "llm_langid_accuracy": _r(12, None, "n-gram language-ID heuristic; 10 driver-green rounds (r2-r11); accuracy-floor pytest + local oracle every round"),
    # POLICY NOTE (VERDICT r11 task 6): ev_stream_sessionize is
    # permanently `no_oracle` — streaming session windows are not
    # SQL-expressible, so its window row could only ever be a weak
    # rows-only check. Its verification home is the stream/batch parity
    # test (tests/test_streaming.py pins the streamed session rows
    # byte-equal to the batch ev_sessionization values, which ARE
    # oracle-verified), plus 9 rows-only-green driver rounds (r3-r11).
    # Rotating it keeps the driver window 100% oracle-bearing.
    "ev_stream_sessionize": _r(12, None, "streaming sessionization; not SQL-expressible (permanent no_oracle) — 9 rows-only-green driver rounds (r3-r11); stream/batch parity pytest pins its values against the oracle-verified batch sessionization every round"),
    "q9_product_profit": _r(7, None, "wide multi-join profit agg; 5 green rounds; BENCH headline"),
    "q18_large_volume_customers": _r(7, None, "semi-join-on-agg + fact-fact exchange; 5 green rounds; BENCH headline"),
    # round 13 rotation — to admit ice_wide_scan (the streaming
    # plan→read / wide-read / in-prune-job-count driver row) in its
    # first round
    "ice_write_scan_filter": _r(13, None, "11 driver-green rounds (r2-r12); write + filtered pruned scan; stays a BENCH headline timed every round, and the local oracle verifies its values every round"),
}


def all_queries():
    """Import all query modules and return the populated registry,
    priority-ordered (see ``_PRIORITY``)."""
    from . import tpch  # noqa: F401
    from . import events  # noqa: F401
    from . import llm  # noqa: F401
    from . import iceberg_ops  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    for n, q in REGISTRY.items():
        if n not in ordered:
            ordered[n] = q
    return ordered
