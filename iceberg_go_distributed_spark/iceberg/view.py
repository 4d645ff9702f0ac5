"""Views: versioned view metadata with per-dialect SQL representations —
ref view/view.go:38-126 + view/metadata.go, following the Iceberg view
spec's JSON layout. Stored through the same catalogs (fs layout:
<warehouse>/<ns>/<view>/metadata/v{N}.view-metadata.json)."""

from __future__ import annotations

import json
import os
import time
import uuid as _uuid
from dataclasses import dataclass, field
from typing import Optional

from .types import Schema


@dataclass(frozen=True)
class SQLRepresentation:
    sql: str
    dialect: str = "spark"

    def to_json(self) -> dict:
        return {"type": "sql", "sql": self.sql, "dialect": self.dialect}


@dataclass(frozen=True)
class ViewVersion:
    version_id: int
    timestamp_ms: int
    schema_id: int
    representations: tuple[SQLRepresentation, ...]
    default_namespace: str = "default"
    summary: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "version-id": self.version_id,
            "timestamp-ms": self.timestamp_ms,
            "schema-id": self.schema_id,
            "summary": self.summary or {"operation": "create"},
            "representations": [r.to_json() for r in self.representations],
            "default-namespace": [self.default_namespace],
        }

    @staticmethod
    def from_json(obj: dict) -> "ViewVersion":
        ns = obj.get("default-namespace", ["default"])
        return ViewVersion(
            version_id=obj["version-id"],
            timestamp_ms=obj["timestamp-ms"],
            schema_id=obj.get("schema-id", 0),
            representations=tuple(
                SQLRepresentation(r["sql"], r.get("dialect", "spark"))
                for r in obj.get("representations", [])
                if r.get("type") == "sql"
            ),
            default_namespace=ns[0] if isinstance(ns, list) else str(ns),
            summary=obj.get("summary", {}),
        )


@dataclass
class ViewMetadata:
    view_uuid: str
    location: str
    current_version_id: int
    versions: list[ViewVersion]
    schemas: list[Schema]
    version_log: list[dict] = field(default_factory=list)
    properties: dict = field(default_factory=dict)

    def current_version(self) -> ViewVersion:
        for v in self.versions:
            if v.version_id == self.current_version_id:
                return v
        raise ValueError(f"current version {self.current_version_id} not found")

    def to_json(self) -> dict:
        return {
            "view-uuid": self.view_uuid,
            "format-version": 1,
            "location": self.location,
            "current-version-id": self.current_version_id,
            "versions": [v.to_json() for v in self.versions],
            "version-log": self.version_log,
            "schemas": [s.to_json() for s in self.schemas],
            "properties": self.properties,
        }

    @staticmethod
    def from_json(obj: dict) -> "ViewMetadata":
        return ViewMetadata(
            view_uuid=obj["view-uuid"],
            location=obj["location"],
            current_version_id=obj["current-version-id"],
            versions=[ViewVersion.from_json(v) for v in obj.get("versions", [])],
            schemas=[Schema.from_json(s) for s in obj.get("schemas", [])],
            version_log=obj.get("version-log", []),
            properties=obj.get("properties", {}),
        )


class View:
    def __init__(self, identifier, metadata: ViewMetadata):
        self.identifier = identifier
        self.metadata = metadata

    def sql(self, dialect: str = "spark") -> str:
        for r in self.metadata.current_version().representations:
            if r.dialect == dialect:
                return r.sql
        raise ValueError(f"no {dialect!r} representation")

    def register(self, spark, name: Optional[str] = None):
        """Materialize as a Spark temp view and return its DataFrame."""
        df = spark.sql(self.sql("spark"))
        df.createOrReplaceTempView(name or str(self.identifier).split(".")[-1])
        return df


def _view_dir(warehouse: str, identifier) -> str:
    from .catalog import _identifier

    ns, name = _identifier(identifier)
    return os.path.join(warehouse, ns, name)


def create_view(
    catalog, identifier, sql: str, schema: Optional[Schema] = None, dialect: str = "spark"
) -> View:
    """fs-catalog view creation (ref view/view.go CreateView path)."""
    d = _view_dir(catalog.warehouse, identifier)
    meta_dir = os.path.join(d, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    now = int(time.time() * 1000)
    schema = schema or Schema(0, ())
    version = ViewVersion(1, now, schema.schema_id, (SQLRepresentation(sql, dialect),))
    md = ViewMetadata(
        view_uuid=str(_uuid.uuid4()),
        location=d,
        current_version_id=1,
        versions=[version],
        schemas=[schema],
        version_log=[{"timestamp-ms": now, "version-id": 1}],
    )
    path = os.path.join(meta_dir, "v1.view-metadata.json")
    with open(path, "w") as f:
        json.dump(md.to_json(), f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")
    return View(identifier, md)


def load_view(catalog, identifier) -> View:
    meta_dir = os.path.join(_view_dir(catalog.warehouse, identifier), "metadata")
    try:
        with open(os.path.join(meta_dir, "version-hint.text")) as f:
            v = int(f.read().strip())
    except FileNotFoundError:
        from .catalog import NoSuchTableError

        raise NoSuchTableError(f"view {identifier} not found") from None
    with open(os.path.join(meta_dir, f"v{v}.view-metadata.json")) as f:
        return View(identifier, ViewMetadata.from_json(json.load(f)))


def drop_view(catalog, identifier) -> None:
    import shutil

    d = _view_dir(catalog.warehouse, identifier)
    if not os.path.isdir(os.path.join(d, "metadata")):
        from .catalog import NoSuchTableError

        raise NoSuchTableError(f"view {identifier} not found")
    shutil.rmtree(d)
