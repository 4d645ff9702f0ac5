"""Write-audit-publish (WAP) — the canonical Iceberg branch workflow,
composed from this engine's branch writes and ref transactions.

A production loader never writes straight to `main`: it stages the
batch on an audit branch (readers of `main` see nothing), runs quality
checks against the branch, and only then publishes by fast-forwarding
`main` to the audited head.  A failed audit costs a `remove_ref` — the
staged snapshot is unreachable and snapshot expiry reclaims its files.

Publish is a FAST-FORWARD, not a merge: it refuses when `main` moved
since the branch was cut (the staged snapshot would silently drop the
concurrent commits), which is exactly the CAS-retry shape of every
other commit in this engine — re-stage on top of the new head and
re-audit.  Convergence and isolation are pinned by
tests/test_wap_example.py.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


class AuditFailed(Exception):
    """A staged batch failed its checks; the branch was dropped."""


class PublishConflict(Exception):
    """`main` advanced since the branch was cut — re-stage and re-audit."""


def stage(table, df: DataFrame, branch: str) -> None:
    """Cut `branch` at the current main head (if it exists) and append
    the batch to it.  `main` is untouched."""
    snap = table.current_snapshot()
    if snap is not None and branch not in table.metadata.refs:
        table.transaction().set_ref(branch, snap.snapshot_id).commit()
        table.refresh()
    table.append(df, branch=branch)


def audit(
    table, spark: SparkSession, branch: str, checks: Iterable[Callable[[DataFrame], bool]]
) -> None:
    """Run every check against the BRANCH's view of the table; on any
    failure drop the branch and raise.  Checks are plain callables over
    a DataFrame so they compose with the quality-filter operators."""
    df = table.scan().use_branch_or_tag(branch).to_df(spark)
    for check in checks:
        if not check(df):
            table.transaction().remove_ref(branch).commit()
            table.refresh()
            raise AuditFailed(f"audit check {check.__name__!r} failed for {branch!r}")


def publish(table, branch: str, on_conflict: str = "fail") -> None:
    """Fast-forward `main` to the audited branch head and drop the
    branch.  When main advanced independently after staging, the
    fast-forward would silently drop the concurrent commits, so the
    default refuses (PublishConflict).  ``on_conflict="cherry-pick"``
    resolves it instead for append-only staged batches: the branch
    head's added manifests are reapplied ON TOP of the moved main
    (Table.cherry_pick — metadata-only, no data rewrite), which is the
    production answer when re-staging and re-auditing a multi-TB batch
    is too expensive and the audit's validity doesn't depend on main's
    concurrent rows."""
    if on_conflict not in ("fail", "cherry-pick"):
        raise ValueError(f"on_conflict={on_conflict!r}: expected fail|cherry-pick")
    md = table.metadata
    ref = md.refs.get(branch)
    if ref is None:
        raise ValueError(f"unknown branch {branch!r}")
    head = ref.snapshot_id
    main_ref = md.refs.get("main")
    if main_ref is not None:
        # main must be reachable from the branch head via parent links
        by_id = {s.snapshot_id: s for s in md.snapshots}
        cur = head
        ok = False
        while cur is not None:
            if cur == main_ref.snapshot_id:
                ok = True
                break
            s = by_id.get(cur)
            cur = s.parent_snapshot_id if s is not None else None
        if not ok:
            if on_conflict == "cherry-pick":
                table.cherry_pick(head)
                table.transaction().remove_ref(branch).commit()
                table.refresh()
                return
            raise PublishConflict(
                f"main moved since {branch!r} was cut; re-stage on the new "
                "head or publish with on_conflict='cherry-pick'"
            )
    tx = table.transaction()
    tx.set_ref("main", head)
    tx.remove_ref(branch)
    tx.commit()
    table.refresh()
