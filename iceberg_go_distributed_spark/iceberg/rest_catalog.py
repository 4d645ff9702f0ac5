"""Iceberg REST catalog client — ref catalog/rest/rest.go (1213 LoC).

Implements the subset of the REST spec the reference exercises for
table lifecycle: config, namespace CRUD, table list/load/create/drop/
rename, and the updates+requirements commit POST (the wire shapes come
from our Update/Requirement `to_json`, which use the REST action
names, so commits round-trip through any conformant server).

Uses urllib only (no external deps). Auth is either a static bearer
token or the OAuth2 client-credentials flow (ref catalog/rest/rest.go
token endpoint): pass ``credential="client_id:client_secret"`` and the
client exchanges it at ``{uri}/v1/oauth/tokens`` (or a custom
``oauth2_server_uri``) before any catalog call, refreshes ahead of
expiry, and retries once on a 401.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Optional

from .catalog import (
    Catalog,
    CommitConflictError,
    NoSuchNamespaceError,
    NoSuchTableError,
    NoSuchViewError,
    TableAlreadyExistsError,
    ViewAlreadyExistsError,
    _identifier,
)
from .metadata import TableMetadata
from .partitioning import PartitionSpec
from .types import Schema


class RestError(Exception):
    def __init__(self, status: int, body: str):
        self.status = status
        super().__init__(f"REST catalog error {status}: {body[:300]}")


class RestCatalog(Catalog):
    name = "rest"

    # refresh this long before the token's stated expiry
    TOKEN_REFRESH_SLACK_S = 30.0

    def __init__(
        self,
        uri: str,
        token: Optional[str] = None,
        warehouse: Optional[str] = None,
        credential: Optional[str] = None,
        scope: str = "catalog",
        oauth2_server_uri: Optional[str] = None,
    ):
        self.uri = uri.rstrip("/")
        self.token = token
        self.warehouse = warehouse
        self.credential = credential
        self.scope = scope
        self.oauth2_server_uri = oauth2_server_uri
        self._token_expires_at: Optional[float] = None
        # config endpoint merges server defaults/overrides
        try:
            cfg = self._get("/v1/config")
            overrides = cfg.get("overrides", {})
            self.warehouse = overrides.get("warehouse", self.warehouse)
        except RestError:
            pass

    # ---------------------------------------------------------------- oauth

    def _fetch_token(self) -> None:
        """client-credentials grant — ref rest.go fetchAccessToken: POST
        form-encoded to /v1/oauth/tokens (or the dedicated auth server)."""
        client_id, _, client_secret = (self.credential or "").partition(":")
        if not client_secret:  # "secret" shorthand: empty client_id
            client_id, client_secret = "", client_id
        form = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": client_id,
                "client_secret": client_secret,
                "scope": self.scope,
            }
        ).encode()
        url = self.oauth2_server_uri or f"{self.uri}/v1/oauth/tokens"
        req = urllib.request.Request(url, data=form, method="POST")
        req.add_header("Content-Type", "application/x-www-form-urlencoded")
        try:
            with urllib.request.urlopen(req) as resp:
                payload = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            raise RestError(e.code, e.read().decode(errors="replace")) from None
        self.token = payload["access_token"]
        expires_in = payload.get("expires_in")
        self._token_expires_at = (
            time.monotonic() + float(expires_in) if expires_in else None
        )

    def _ensure_token(self) -> None:
        if not self.credential:
            return
        if self.token is None or (
            self._token_expires_at is not None
            and time.monotonic() >= self._token_expires_at - self.TOKEN_REFRESH_SLACK_S
        ):
            self._fetch_token()

    # ------------------------------------------------------------ plumbing

    def _req(
        self,
        method: str,
        path: str,
        body: Optional[dict] = None,
        _retry_auth: bool = True,
        error_map: Optional[dict] = None,
    ) -> dict:
        """`error_map` overrides the default status→exception mapping
        per call (status code → exception class), the same shape as the
        reference's per-route errorMap argument (catalog/rest/rest.go:
        722,769,1133,1206) — so view routes can raise NoSuchViewError /
        NoSuchNamespaceError instead of the table defaults."""
        self._ensure_token()
        url = f"{self.uri}{path}"
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req) as resp:
                payload = resp.read()
                return json.loads(payload) if payload else {}
        except urllib.error.HTTPError as e:
            body_s = e.read().decode(errors="replace")
            if e.code == 401 and self.credential and _retry_auth:
                # token revoked/expired server-side: re-exchange and retry once
                self.token = None
                return self._req(
                    method, path, body, _retry_auth=False, error_map=error_map
                )
            override = (error_map or {}).get(e.code)
            if override is not None:
                raise override(body_s) from None
            if e.code == 404:
                raise NoSuchTableError(body_s) from None
            if e.code == 409:
                if "conflict" in body_s.lower() or "commit" in body_s.lower():
                    raise CommitConflictError(body_s) from None
                raise TableAlreadyExistsError(body_s) from None
            raise RestError(e.code, body_s) from None

    def _get(self, path: str) -> dict:
        return self._req("GET", path)

    @staticmethod
    def _ns_path(ns: str) -> str:
        return urllib.parse.quote(ns.replace(".", "\x1f"), safe="")

    # -------------------------------------------------------------- tables

    def create_table(self, identifier, schema: Schema, spec=None, properties=None, location=None):
        from .table import Table

        ns, tbl = _identifier(identifier)
        body = {
            "name": tbl,
            "schema": schema.to_json(),
            "partition-spec": (spec or PartitionSpec.unpartitioned()).to_json(),
            "properties": dict(properties or {}),
        }
        if location:
            body["location"] = location
        resp = self._req("POST", f"/v1/namespaces/{self._ns_path(ns)}/tables", body)
        md = TableMetadata.from_json(resp["metadata"])
        return Table(identifier, md, resp.get("metadata-location", ""), self)

    def load_table(self, identifier):
        from .table import Table

        ns, tbl = _identifier(identifier)
        resp = self._get(f"/v1/namespaces/{self._ns_path(ns)}/tables/{tbl}")
        md = TableMetadata.from_json(resp["metadata"])
        return Table(identifier, md, resp.get("metadata-location", ""), self)

    def register_table(self, identifier, metadata_location: str):
        """Spec endpoint POST /v1/namespaces/{ns}/register — ref
        catalog/rest.go RegisterTable. The server adopts the existing
        metadata file; nothing is rewritten."""
        from .table import Table

        ns, tbl = _identifier(identifier)
        resp = self._req(
            "POST",
            f"/v1/namespaces/{self._ns_path(ns)}/register",
            {"name": tbl, "metadata-location": metadata_location},
        )
        md = TableMetadata.from_json(resp["metadata"])
        return Table(
            identifier, md, resp.get("metadata-location", metadata_location), self
        )

    def drop_table(self, identifier) -> None:
        ns, tbl = _identifier(identifier)
        self._req("DELETE", f"/v1/namespaces/{self._ns_path(ns)}/tables/{tbl}")

    def rename_table(self, src, dst):
        ns_s, t_s = _identifier(src)
        ns_d, t_d = _identifier(dst)
        self._req(
            "POST",
            "/v1/tables/rename",
            {
                "source": {"namespace": [ns_s], "name": t_s},
                "destination": {"namespace": [ns_d], "name": t_d},
            },
        )
        return self.load_table(dst)

    def _paged_identifiers(self, path: str, page_size: Optional[int]):
        """Follow `next-page-token` until the listing is exhausted —
        ref catalog/rest/rest.go:679-700 (ListTables) / 1055-1078
        (ListViews): pageToken/pageSize go out as query params, the
        server's `next-page-token` drives the loop, an absent/empty
        token ends it. A server that ignores paging returns everything
        with no token — one round trip, same result.

        A buggy server must not loop us forever: a REPEATED token, a
        stream of >10k distinct tokens, or 100 consecutive empty pages
        each abort with RestError instead of spinning."""
        out, token, seen, empty_run = [], None, set(), 0
        while True:
            q = {}
            if page_size is not None:
                q["pageSize"] = str(page_size)
            if token:
                q["pageToken"] = token
            qs = ("?" + urllib.parse.urlencode(q)) if q else ""
            resp = self._get(f"{path}{qs}")
            page = resp.get("identifiers", [])
            out.extend(page)
            empty_run = 0 if page else empty_run + 1
            token = resp.get("next-page-token") or ""
            if not token:
                return out
            if token in seen:
                raise RestError(
                    200, f"server repeated page token {token!r} on {path}"
                )
            if len(seen) >= 10_000:
                raise RestError(200, f"paging exceeded 10000 pages on {path}")
            if empty_run >= 100:
                raise RestError(
                    200, f"100 consecutive empty pages with tokens on {path}"
                )
            seen.add(token)

    def list_tables(self, namespace: str, page_size: Optional[int] = None):
        idents = self._paged_identifiers(
            f"/v1/namespaces/{self._ns_path(namespace)}/tables", page_size
        )
        return [(".".join(t["namespace"]), t["name"]) for t in idents]

    def commit_table(self, identifier, base_metadata_location, new_metadata) -> str:
        """The REST commit is updates+requirements, not a metadata blob:
        the transaction layer calls us with the already-built metadata,
        and we ship its delta via `commit_via_updates` instead."""
        raise NotImplementedError(
            "REST commits go through commit_via_updates(updates, requirements)"
        )

    def commit_via_updates(self, identifier, updates, requirements) -> TableMetadata:
        ns, tbl = _identifier(identifier)
        body = {
            "identifier": {"namespace": [ns], "name": tbl},
            "updates": [u.to_json() for u in updates],
            "requirements": [r.to_json() for r in requirements],
        }
        resp = self._req(
            "POST", f"/v1/namespaces/{self._ns_path(ns)}/tables/{tbl}", body
        )
        return TableMetadata.from_json(resp["metadata"])

    # ---------------------------------------------------------------- views
    # ref catalog/rest/rest.go view surface: CreateView (1173-1213,
    # createViewRequest 1156-1163), ListViews (1055-1078, paged),
    # DropView (doDelete 1132), CheckViewExists (doHead 1144). Load is
    # the spec's GET on the same route (the Go client reads views
    # through the loadView response shape it shares with create).

    def create_view(
        self,
        identifier,
        sql: str,
        schema: Optional[Schema] = None,
        properties: Optional[dict] = None,
        dialect: str = "spark",
    ):
        from .view import SQLRepresentation, View, ViewMetadata, ViewVersion

        ns, name = _identifier(identifier)
        schema = schema or Schema(0, ())
        # one source of truth for the version wire shape (view.py);
        # the spec wants the namespace as a LIST OF LEVELS, matching
        # the level-split route the request posts to
        vv = ViewVersion(
            1,
            int(time.time() * 1000),
            schema.schema_id,
            (SQLRepresentation(sql, dialect),),
            summary={"sql": sql},
        ).to_json()
        vv["default-namespace"] = ns.split(".")
        body = {
            "name": name,
            "schema": schema.to_json(),
            "sql": sql,
            "properties": dict(properties or {}),
            "view-version": vv,
        }
        resp = self._req(
            "POST",
            f"/v1/namespaces/{self._ns_path(ns)}/views",
            body,
            # ref rest.go:1204-1207: 404 means the NAMESPACE is missing,
            # 409 means the VIEW exists — not the table defaults
            error_map={404: NoSuchNamespaceError, 409: ViewAlreadyExistsError},
        )
        return View(identifier, ViewMetadata.from_json(resp["metadata"]))

    _VIEW_404 = {404: NoSuchViewError}  # ref rest.go:1133,1145

    def load_view(self, identifier):
        from .view import View, ViewMetadata

        ns, name = _identifier(identifier)
        resp = self._req(
            "GET",
            f"/v1/namespaces/{self._ns_path(ns)}/views/{name}",
            error_map=self._VIEW_404,
        )
        return View(identifier, ViewMetadata.from_json(resp["metadata"]))

    def drop_view(self, identifier) -> None:
        ns, name = _identifier(identifier)
        self._req(
            "DELETE",
            f"/v1/namespaces/{self._ns_path(ns)}/views/{name}",
            error_map=self._VIEW_404,
        )

    def view_exists(self, identifier) -> bool:
        ns, name = _identifier(identifier)
        try:
            self._req(
                "HEAD",
                f"/v1/namespaces/{self._ns_path(ns)}/views/{name}",
                error_map=self._VIEW_404,
            )
            return True
        except NoSuchViewError:  # ref rest.go:1147 (CheckViewExists)
            return False

    def list_views(self, namespace: str, page_size: Optional[int] = None):
        idents = self._paged_identifiers(
            f"/v1/namespaces/{self._ns_path(namespace)}/views", page_size
        )
        return [(".".join(v["namespace"]), v["name"]) for v in idents]

    # ----------------------------------------------------------- namespaces

    def create_namespace(self, namespace: str, properties=None) -> None:
        self._req(
            "POST",
            "/v1/namespaces",
            {"namespace": [namespace], "properties": dict(properties or {})},
        )

    def drop_namespace(self, namespace: str) -> None:
        self._req("DELETE", f"/v1/namespaces/{self._ns_path(namespace)}")

    def list_namespaces(self, parent: Optional[str] = None):
        """ref catalog/rest/rest.go:962-977 (ListNamespaces): a non-empty
        `parent` goes out as a query param (levels joined by the unit
        separator) and restricts the listing to that namespace's
        children; 404 means the parent namespace doesn't exist."""
        path = "/v1/namespaces"
        if parent:
            path += "?" + urllib.parse.urlencode(
                {"parent": parent.replace(".", "\x1f")}
            )
        resp = self._req(
            "GET", path, error_map={404: NoSuchNamespaceError}
        )
        return [".".join(n) for n in resp.get("namespaces", [])]

    def load_namespace_properties(self, namespace: str) -> dict:
        resp = self._get(f"/v1/namespaces/{self._ns_path(namespace)}")
        return resp.get("properties", {})

    def update_namespace_properties(self, namespace, removals=(), updates=None) -> None:
        self._req(
            "POST",
            f"/v1/namespaces/{self._ns_path(namespace)}/properties",
            {"removals": list(removals), "updates": dict(updates or {})},
        )
