"""REST catalog client against an in-process conformance server.

The fake server stores metadata in memory and implements the endpoints
the client uses, including the updates+requirements commit with
AssertRefSnapshotID conflict checking — so the test proves our
Update/Requirement JSON is a self-consistent wire protocol."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.catalog import (
    CommitConflictError,
    NoSuchNamespaceError,
    NoSuchTableError,
    NoSuchViewError,
    TableAlreadyExistsError,
    ViewAlreadyExistsError,
)
from iceberg_go_distributed_spark.iceberg.metadata import (
    MetadataBuilder,
    TableMetadata,
    new_table_metadata,
)
from iceberg_go_distributed_spark.iceberg.partitioning import PartitionSpec
from iceberg_go_distributed_spark.iceberg.rest_catalog import RestCatalog, RestError
from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema


class _State:
    def __init__(self, require_oauth: bool = False):
        self.tables: dict[tuple[str, str], dict] = {}
        self.views: dict[tuple[str, str], dict] = {}
        self.namespaces: dict[str, dict] = {"default": {}}
        self.list_requests: list[str] = []  # paging audit trail
        # oauth mode: client-credentials exchange mints tokens; every
        # catalog endpoint 401s without a currently-valid one
        self.require_oauth = require_oauth
        self.clients: dict[str, str] = {"svc": "s3cr3t"}
        self.issued_tokens: set[str] = set()
        self.token_counter = 0


def _apply_updates(md_json: dict, updates: list[dict], requirements: list[dict]) -> dict:
    md = TableMetadata.from_json(md_json)
    # requirement validation (subset: ref + uuid)
    for r in requirements:
        if r["type"] == "assert-ref-snapshot-id":
            ref = md.refs.get(r["ref"])
            actual = ref.snapshot_id if ref else None
            if actual != r.get("snapshot-id"):
                raise _Conflict(f"ref {r['ref']} moved")
        elif r["type"] == "assert-table-uuid":
            if md.table_uuid != r["uuid"]:
                raise _Conflict("uuid mismatch")
    b = MetadataBuilder(md)
    from iceberg_go_distributed_spark.iceberg.metadata import Snapshot

    for u in updates:
        a = u["action"]
        if a == "add-snapshot":
            b.add_snapshot(Snapshot.from_json(u["snapshot"]))
        elif a == "set-snapshot-ref":
            b.set_snapshot_ref(u["ref-name"], u["snapshot-id"], u.get("type", "branch"))
        elif a == "set-properties":
            b.set_properties(u["updates"])
        elif a == "remove-properties":
            b.remove_properties(u["removals"])
        elif a == "add-schema":
            b.add_schema(Schema.from_json(u["schema"]))
        elif a == "set-current-schema":
            b.set_current_schema(u["schema-id"])
        elif a == "upgrade-format-version":
            from iceberg_go_distributed_spark.iceberg.transaction import (
                UpgradeFormatVersion,
            )

            UpgradeFormatVersion(u["format-version"]).apply(b)
    return b.build().to_json()


class _Conflict(Exception):
    pass


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj=None):
            body = json.dumps(obj or {}).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n)) if n else {}

        def _raw_body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n) if n else b""

        def _authorized(self) -> bool:
            if not state.require_oauth:
                return True
            auth = self.headers.get("Authorization", "")
            return (
                auth.startswith("Bearer ")
                and auth[len("Bearer ") :] in state.issued_tokens
            )

        def _split(self):
            """(path parts, query dict) — list endpoints take paging
            query params, so the raw path may carry a query string."""
            import urllib.parse as _up

            s = _up.urlsplit(self.path)
            return [p for p in s.path.split("/") if p], dict(_up.parse_qsl(s.query))

        def _paged_ids(self, ids, q):
            """Slice an identifier listing per pageSize/pageToken and
            emit next-page-token while more remain (the client must
            loop — this is what the pagination tests verify)."""
            state.list_requests.append(self.path)
            if "pageSize" not in q:
                return {"identifiers": ids}
            size = max(1, int(q["pageSize"]))
            start = int(q.get("pageToken") or 0)
            out = {"identifiers": ids[start : start + size]}
            if start + size < len(ids):
                out["next-page-token"] = str(start + size)
            return out

        def do_GET(self):
            parts, q = self._split()
            if not self._authorized():
                return self._send(401, {"error": "unauthorized"})
            if parts == ["v1", "config"]:
                return self._send(200, {"overrides": {}, "defaults": {}})
            if parts == ["v1", "namespaces"]:
                if "parent" in q:
                    parent = q["parent"].replace("\x1f", ".")
                    if parent not in state.namespaces:
                        return self._send(404, {"error": "no such namespace"})
                    kids = [
                        n.split(".")
                        for n in sorted(state.namespaces)
                        if n.startswith(parent + ".")
                    ]
                    return self._send(200, {"namespaces": kids})
                return self._send(
                    200, {"namespaces": [[n] for n in sorted(state.namespaces)]}
                )
            if len(parts) == 3 and parts[:2] == ["v1", "namespaces"]:
                ns = parts[2]
                if ns not in state.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                return self._send(200, {"namespace": [ns], "properties": state.namespaces[ns]})
            if len(parts) == 4 and parts[3] in ("tables", "views"):
                ns = parts[2]
                store = state.tables if parts[3] == "tables" else state.views
                ids = [
                    {"namespace": [n], "name": t}
                    for (n, t) in sorted(store)
                    if n == ns
                ]
                return self._send(200, self._paged_ids(ids, q))
            if len(parts) == 5 and parts[3] == "tables":
                key = (parts[2], parts[4])
                if key not in state.tables:
                    return self._send(404, {"error": "no such table"})
                return self._send(
                    200,
                    {"metadata": state.tables[key], "metadata-location": f"mem://{key}"},
                )
            if len(parts) == 5 and parts[3] == "views":
                key = (parts[2], parts[4])
                if key not in state.views:
                    return self._send(404, {"error": "no such view"})
                return self._send(
                    200,
                    {"metadata": state.views[key], "metadata-location": f"mem://{key}"},
                )
            return self._send(404, {"error": "unknown"})

        def do_HEAD(self):
            parts, _ = self._split()
            if len(parts) == 5 and parts[3] == "views":
                key = (parts[2], parts[4])
                code = 200 if key in state.views else 404
                self.send_response(code)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_POST(self):
            parts = [p for p in self.path.split("/") if p]
            if parts == ["v1", "oauth", "tokens"]:
                import urllib.parse as _up

                form = dict(_up.parse_qsl(self._raw_body().decode()))
                ok = (
                    form.get("grant_type") == "client_credentials"
                    and state.clients.get(form.get("client_id", "")) == form.get("client_secret")
                )
                if not ok:
                    return self._send(401, {"error": "invalid_client"})
                state.token_counter += 1
                tok = f"tok-{state.token_counter}"
                state.issued_tokens.add(tok)
                return self._send(
                    200,
                    {"access_token": tok, "token_type": "bearer", "expires_in": 3600},
                )
            if not self._authorized():
                return self._send(401, {"error": "unauthorized"})
            body = self._body()
            if parts == ["v1", "namespaces"]:
                ns = body["namespace"][0]
                state.namespaces[ns] = body.get("properties", {})
                return self._send(200, {"namespace": [ns]})
            if parts == ["v1", "tables", "rename"]:
                src = (body["source"]["namespace"][0], body["source"]["name"])
                dst = (body["destination"]["namespace"][0], body["destination"]["name"])
                if src not in state.tables:
                    return self._send(404, {"error": "no such table"})
                if dst in state.tables:
                    return self._send(409, {"error": "already exists"})
                state.tables[dst] = state.tables.pop(src)
                return self._send(200, {})
            if len(parts) == 4 and parts[3] == "register":
                ns, name = parts[2], body["name"]
                key = (ns, name)
                if key in state.tables:
                    return self._send(409, {"error": "table already exists"})
                with open(body["metadata-location"]) as f:
                    state.tables[key] = json.load(f)
                return self._send(
                    200,
                    {
                        "metadata": state.tables[key],
                        "metadata-location": body["metadata-location"],
                    },
                )
            if len(parts) == 4 and parts[3] == "tables":
                ns, name = parts[2], body["name"]
                key = (ns, name)
                if key in state.tables:
                    return self._send(409, {"error": "table already exists"})
                md = new_table_metadata(
                    Schema.from_json(body["schema"]),
                    PartitionSpec.from_json(body.get("partition-spec", {})),
                    body.get("location", f"mem://{ns}/{name}"),
                    body.get("properties", {}),
                )
                state.tables[key] = md.to_json()
                return self._send(
                    200, {"metadata": state.tables[key], "metadata-location": f"mem://{key}"}
                )
            if len(parts) == 5 and parts[3] == "tables":
                key = (parts[2], parts[4])
                if key not in state.tables:
                    return self._send(404, {"error": "no such table"})
                try:
                    state.tables[key] = _apply_updates(
                        state.tables[key], body["updates"], body["requirements"]
                    )
                except _Conflict as e:
                    return self._send(409, {"error": f"commit conflict: {e}"})
                return self._send(
                    200, {"metadata": state.tables[key], "metadata-location": f"mem://{key}"}
                )
            if len(parts) == 4 and parts[3] == "views":
                ns, name = parts[2], body["name"]
                key = (ns, name)
                if ns not in state.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                if key in state.views:
                    return self._send(409, {"error": "view already exists"})
                import uuid as _u

                vv = dict(body["view-version"])
                state.views[key] = {
                    "view-uuid": str(_u.uuid4()),
                    "format-version": 1,
                    "location": f"mem://{ns}/{name}",
                    "current-version-id": vv.get("version-id", 1),
                    "versions": [vv],
                    "version-log": [
                        {
                            "timestamp-ms": vv.get("timestamp-ms", 0),
                            "version-id": vv.get("version-id", 1),
                        }
                    ],
                    "schemas": [body["schema"]],
                    "properties": body.get("properties", {}),
                }
                return self._send(
                    200,
                    {"metadata": state.views[key], "metadata-location": f"mem://{key}"},
                )
            if len(parts) == 4 and parts[3] == "properties":
                ns = parts[2]
                props = state.namespaces.setdefault(ns, {})
                for k in body.get("removals", []):
                    props.pop(k, None)
                props.update(body.get("updates", {}))
                return self._send(200, {})
            return self._send(404, {"error": "unknown"})

        def do_DELETE(self):
            parts = [p for p in self.path.split("/") if p]
            if not self._authorized():
                return self._send(401, {"error": "unauthorized"})
            if len(parts) == 5 and parts[3] == "tables":
                key = (parts[2], parts[4])
                if key not in state.tables:
                    return self._send(404, {"error": "no such table"})
                del state.tables[key]
                return self._send(204)
            if len(parts) == 5 and parts[3] == "views":
                key = (parts[2], parts[4])
                if key not in state.views:
                    return self._send(404, {"error": "no such view"})
                del state.views[key]
                return self._send(204)
            if len(parts) == 3:
                ns = parts[2]
                if ns not in state.namespaces:
                    return self._send(404, {"error": "no such namespace"})
                del state.namespaces[ns]
                return self._send(204)
            return self._send(404, {"error": "unknown"})

    return Handler


@pytest.fixture()
def rest_server():
    state = _State()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


@pytest.fixture()
def oauth_rest_server():
    state = _State(require_oauth=True)
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}", state
    server.shutdown()


SCHEMA = Schema.of(
    0,
    NestedField(1, "id", ty.LongType(), required=True),
    NestedField(2, "data", ty.StringType()),
)


def test_rest_catalog_lifecycle(rest_server):
    cat = RestCatalog(rest_server, token="t0ken")
    cat.create_namespace("db", {"owner": "rest"})
    assert "db" in cat.list_namespaces()
    assert cat.load_namespace_properties("db")["owner"] == "rest"

    t = cat.create_table("db.t1", SCHEMA)
    assert t.schema().fields[0].name == "id"
    assert cat.list_tables("db") == [("db", "t1")]
    t2 = cat.load_table("db.t1")
    assert t2.metadata.table_uuid == t.metadata.table_uuid

    cat.rename_table("db.t1", "db.t2")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.t1")
    cat.drop_table("db.t2")
    with pytest.raises(NoSuchTableError):
        cat.load_table("db.t2")


def test_rest_commit_updates_and_conflict(rest_server):
    """Commit via the wire-format updates/requirements, then force an
    AssertRefSnapshotID conflict — the distributed-snapshot guard over
    REST (ref rest.go commit path + distributed_snapshot_test.go:131)."""
    from iceberg_go_distributed_spark.iceberg.metadata import Snapshot, Summary
    from iceberg_go_distributed_spark.iceberg.transaction import (
        AddSnapshotUpdate,
        AssertRefSnapshotID,
        AssertTableUUID,
        SetProperties,
        SetSnapshotRef,
    )

    cat = RestCatalog(rest_server)
    cat.create_namespace("db")
    t = cat.create_table("db.c1", SCHEMA)

    # property commit round-trips
    md = cat.commit_via_updates(
        "db.c1", [SetProperties({"k": "v"})], [AssertTableUUID(t.metadata.table_uuid)]
    )
    assert md.properties["k"] == "v"

    snap = Snapshot(
        snapshot_id=1001,
        sequence_number=1,
        timestamp_ms=md.last_updated_ms + 10,
        manifest_list="mem://snap-1001.avro",
        summary=Summary("append"),
    )
    md = cat.commit_via_updates(
        "db.c1",
        [AddSnapshotUpdate(snap), SetSnapshotRef("main", 1001)],
        [AssertRefSnapshotID("main", None)],
    )
    assert md.current_snapshot_id == 1001

    # stale parent → 409 → CommitConflictError
    snap2 = Snapshot(
        snapshot_id=1002,
        sequence_number=2,
        timestamp_ms=md.last_updated_ms + 10,
        manifest_list="mem://snap-1002.avro",
        summary=Summary("append"),
    )
    with pytest.raises(CommitConflictError):
        cat.commit_via_updates(
            "db.c1",
            [AddSnapshotUpdate(snap2), SetSnapshotRef("main", 1002)],
            [AssertRefSnapshotID("main", None)],  # stale: main is at 1001
        )
    # correct parent succeeds
    md = cat.commit_via_updates(
        "db.c1",
        [AddSnapshotUpdate(snap2), SetSnapshotRef("main", 1002)],
        [AssertRefSnapshotID("main", 1001)],
    )
    assert md.current_snapshot_id == 1002


def test_transaction_commit_routes_through_rest(rest_server):
    """Table.transaction().commit() on a REST-loaded table ships the
    update delta over the wire instead of a metadata blob."""
    cat = RestCatalog(rest_server)
    cat.create_namespace("db")
    t = cat.create_table("db.tx", SCHEMA)
    tx = t.transaction()
    tx.set_properties({"via": "wire"})
    tx.commit()
    assert t.properties["via"] == "wire"
    # server state agrees (fresh load)
    t2 = cat.load_table("db.tx")
    assert t2.properties["via"] == "wire"
    # schema evolution through the same route
    t2.update_schema().add_column("extra", __import__(
        "iceberg_go_distributed_spark.iceberg.types", fromlist=["StringType"]
    ).StringType()).commit()
    t3 = cat.load_table("db.tx")
    assert any(f.name == "extra" for f in t3.schema().fields)


def test_rest_v3_upgrade_and_lineage_commit(rest_server):
    """The v3 surface over the wire: upgrade-format-version ships as an
    update action, and an add-snapshot update carries first-row-id/
    added-rows so the server-side builder advances next-row-id — the
    lineage fields survive the updates/requirements protocol."""
    import time as _time

    from iceberg_go_distributed_spark.iceberg.metadata import Snapshot, Summary
    from iceberg_go_distributed_spark.iceberg.transaction import (
        AddSnapshotUpdate,
        AssertTableUUID,
        SetSnapshotRef,
    )

    cat = RestCatalog(rest_server)
    cat.create_namespace("dbv3")
    t = cat.create_table("dbv3.tv3", SCHEMA)
    t.upgrade_format_version(3)
    assert t.metadata.format_version == 3
    assert t.metadata.next_row_id == 0

    snap = Snapshot(
        snapshot_id=42,
        sequence_number=1,
        timestamp_ms=int(_time.time() * 1000),
        manifest_list="memory://tv3/snap-42.avro",
        summary=Summary("append"),
        first_row_id=0,
        added_rows=77,
    )
    tx = t.transaction()
    tx.apply(
        [AddSnapshotUpdate(snap), SetSnapshotRef("main", 42)],
        [AssertTableUUID(t.metadata.table_uuid)],
    )
    tx.commit()

    t2 = cat.load_table("dbv3.tv3")
    assert t2.metadata.format_version == 3
    assert t2.metadata.next_row_id == 77
    assert t2.current_snapshot().first_row_id == 0
    assert t2.current_snapshot().added_rows == 77


def test_oauth_client_credentials_flow(oauth_rest_server):
    """Token exchange before catalog calls, and re-exchange + retry when
    the server revokes the token — ref catalog/rest/rest.go OAuth."""
    from iceberg_go_distributed_spark.iceberg.rest_catalog import RestError

    uri, state = oauth_rest_server

    # no credential, no token → every call 401s
    bare = RestCatalog.__new__(RestCatalog)
    bare.uri = uri
    bare.token = None
    bare.credential = None
    bare._token_expires_at = None
    with pytest.raises(RestError) as ei:
        bare._get("/v1/namespaces")
    assert ei.value.status == 401

    # wrong secret → the token endpoint itself rejects
    with pytest.raises(RestError):
        RestCatalog(uri, credential="svc:wrong").list_namespaces()

    # correct client credentials → exchange, then calls work
    cat = RestCatalog(uri, credential="svc:s3cr3t")
    cat.create_namespace("db")
    t = cat.create_table("db.t1", SCHEMA)
    assert cat.list_tables("db") == [("db", "t1")]
    assert cat.token in state.issued_tokens
    assert state.token_counter >= 1

    # server-side revocation → 401 → client re-exchanges and retries once
    before = state.token_counter
    state.issued_tokens.clear()
    assert cat.load_table("db.t1").metadata.table_uuid == t.metadata.table_uuid
    assert state.token_counter == before + 1  # exactly one re-exchange


def test_oauth_token_refresh_before_expiry(oauth_rest_server):
    """A token near its expires_in horizon is refreshed proactively."""
    uri, state = oauth_rest_server
    cat = RestCatalog(uri, credential="svc:s3cr3t")
    first = state.token_counter
    # simulate the expiry horizon passing
    import time as _time

    cat._token_expires_at = _time.monotonic() + 5  # < refresh slack (30s)
    cat.list_namespaces()
    assert state.token_counter == first + 1


def test_rest_register_table(rest_server, tmp_path, spark):
    """POST /v1/namespaces/{ns}/register adopts an existing metadata
    file; the registered table scans identically and keeps its original
    location."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog

    src_cat = FileSystemCatalog(str(tmp_path / "src_wh"))
    src = src_cat.create_table("db.src", SCHEMA)
    src.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, data string").coalesce(1)
    )

    cat = RestCatalog(rest_server, token="t0ken")
    cat.create_namespace("regdb")
    reg = cat.register_table("regdb.adopted", src.metadata_location)
    assert reg.metadata.table_uuid == src.metadata.table_uuid
    assert sorted(
        (r.id, r.data) for r in reg.scan().to_df(spark).collect()
    ) == [(1, "a"), (2, "b")]
    with pytest.raises(TableAlreadyExistsError):
        cat.register_table("regdb.adopted", src.metadata_location)


def test_rest_list_pagination():
    """list_tables/list_views follow next-page-token until exhausted —
    ref catalog/rest/rest.go:679-700/1055-1078 page loops. Uses a
    local server handle so the request log proves the client was
    driven page by page rather than getting one lucky full response."""
    state = _State()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        cat = RestCatalog(f"http://127.0.0.1:{server.server_port}", token="t")
        cat.create_namespace("pg")
        for i in range(7):
            cat.create_table(f"pg.t{i}", SCHEMA)
        # unpaged: one request, everything back
        state.list_requests.clear()
        assert len(cat.list_tables("pg")) == 7
        assert len(state.list_requests) == 1
        # paged: the client loops pageToken; union equals the full listing
        state.list_requests.clear()
        got = cat.list_tables("pg", page_size=3)
        assert sorted(got) == sorted(("pg", f"t{i}") for i in range(7))
        assert len(state.list_requests) == 3  # 3 + 3 + 1
        assert "pageToken=3" in state.list_requests[1]
        assert "pageToken=6" in state.list_requests[2]
    finally:
        server.shutdown()


def test_rest_view_crud_and_paging(rest_server):
    cat = RestCatalog(rest_server, token="t")
    cat.create_namespace("vw")
    v = cat.create_view(
        "vw.rev", "SELECT o_orderkey FROM orders", properties={"team": "data"}
    )
    assert v.sql("spark") == "SELECT o_orderkey FROM orders"
    assert cat.view_exists("vw.rev")
    assert not cat.view_exists("vw.nope")
    loaded = cat.load_view("vw.rev")
    assert loaded.sql("spark") == "SELECT o_orderkey FROM orders"
    assert loaded.metadata.current_version_id == 1
    assert loaded.metadata.properties == {"team": "data"}
    for i in range(4):
        cat.create_view(f"vw.v{i}", f"SELECT {i}")
    assert len(cat.list_views("vw")) == 5
    assert sorted(cat.list_views("vw", page_size=2)) == sorted(
        cat.list_views("vw")
    )
    cat.drop_view("vw.rev")
    assert not cat.view_exists("vw.rev")
    with pytest.raises(NoSuchViewError):
        cat.load_view("vw.rev")


def test_rest_view_error_mapping(rest_server):
    """View routes carry their own 404/409 meanings — ref
    catalog/rest/rest.go:1133,1145 (ErrNoSuchView on load/drop/head)
    and 1204-1207 (create: 404=ErrNoSuchNamespace, 409=
    ErrViewAlreadyExists) — distinct from the table defaults."""
    cat = RestCatalog(rest_server, token="t")
    cat.create_namespace("ve")
    cat.create_view("ve.v1", "SELECT 1")
    with pytest.raises(ViewAlreadyExistsError):
        cat.create_view("ve.v1", "SELECT 2")
    with pytest.raises(NoSuchNamespaceError):
        cat.create_view("ghostns.v1", "SELECT 1")
    with pytest.raises(NoSuchViewError):
        cat.load_view("ve.missing")
    with pytest.raises(NoSuchViewError):
        cat.drop_view("ve.missing")


def test_rest_list_namespaces_parent(rest_server):
    """`parent` query param restricts the listing to children of that
    namespace — ref catalog/rest/rest.go:962-977; a missing parent is
    a NoSuchNamespaceError, not an empty list."""
    cat = RestCatalog(rest_server, token="t")
    cat.create_namespace("acct")
    cat.create_namespace("acct.sales")
    cat.create_namespace("acct.eng")
    cat.create_namespace("other")
    assert sorted(cat.list_namespaces(parent="acct")) == [
        "acct.eng",
        "acct.sales",
    ]
    # unscoped listing still returns everything
    assert "other" in cat.list_namespaces()
    with pytest.raises(NoSuchNamespaceError):
        cat.list_namespaces(parent="ghost")


def test_rest_paging_runaway_server_bounded(rest_server):
    """A misbehaving server emitting endless DISTINCT tokens with empty
    pages must abort, not loop forever (ADVICE r12)."""
    cat = RestCatalog(rest_server, token="t")
    calls = {"n": 0}

    def fake_get(path):
        calls["n"] += 1
        return {"identifiers": [], "next-page-token": f"t{calls['n']}"}

    cat._get = fake_get
    with pytest.raises(RestError, match="empty pages"):
        cat._paged_identifiers("/v1/namespaces/x/tables", page_size=10)
    assert calls["n"] <= 101
