"""AWS Glue catalog — ref catalog/glue/glue.go (802 LoC) +
catalog/glue/schema.go (149 LoC).

Glue stores one `Table` object per Iceberg table; the Iceberg pointer
lives in the table's Parameters map (`table_type=ICEBERG`,
`metadata_location`, `previous_metadata_location` — ref glue.go:54-56)
and commits are optimistic-locked on Glue's own `VersionId`
(ref glue.go:338-345: UpdateTable(VersionId=current) — a concurrent
committer's bump makes the update fail, which maps to our
CommitConflictError so the transaction layer retries exactly like the
SQL/REST backends).

The client is ANY object speaking the boto3 Glue surface
(create_table / get_table / get_tables / update_table / delete_table /
create_database / get_database / get_databases / delete_database /
update_database, PascalCase kwargs, dict responses, NextToken
pagination). Pass one explicitly, or the catalog builds a boto3 client
from the standard properties (`glue.region`, `glue.endpoint`,
`glue.access-key-id`, `glue.secret-access-key`, `glue.session-token`,
`glue.id` — ref glue.go:60-75,94-126); boto3 is imported lazily and
its absence raises a clear error only when no client was injected.
The conformance tests run against an in-memory double implementing
the same response/error shapes (tests/test_glue_catalog.py), the same
strategy the REST catalog uses with its local conformance server.
"""

from __future__ import annotations

import os
import uuid as _uuid
from typing import Optional

from .catalog import (
    Catalog,
    CommitConflictError,
    NoSuchNamespaceError,
    NoSuchTableError,
    TableAlreadyExistsError,
    _identifier,
    _write_metadata_file,
    parse_metadata_file,
)
from .metadata import TableMetadata
from .types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    FloatType,
    IntegerType,
    ListType,
    LongType,
    MapType,
    Schema,
    StringType,
    StructType,
    TimestampType,
    TimestampTzType,
    TimeType,
    UUIDType,
)

# ref glue.go:46-56
GLUE_TYPE_ICEBERG = "ICEBERG"
GLUE_TABLE_TYPE = "EXTERNAL_TABLE"
PARAM_TABLE_TYPE = "table_type"
PARAM_METADATA_LOCATION = "metadata_location"
PARAM_PREV_METADATA_LOCATION = "previous_metadata_location"
PROPS_KEY_LOCATION = "location"
PROPS_KEY_DESCRIPTION = "Description"
# ref glue.go:76-79 (column parameters carrying Iceberg field identity)
FIELD_ID_KEY = "iceberg.field.id"
FIELD_OPTIONAL_KEY = "iceberg.field.optional"
FIELD_CURRENT_KEY = "iceberg.field.current"
# ref glue.go:63-66: skip archiving old versions on commit by default
SKIP_ARCHIVE_KEY = "glue.skip-archive"


def _aws_error_code(exc: Exception) -> str:
    """The Glue error name, whether the exception is a botocore
    ClientError (code in response['Error']['Code']) or a plain class
    named after the AWS shape (the test double raises those)."""
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        code = resp.get("Error", {}).get("Code")
        if code:
            return str(code)
    return type(exc).__name__


def glue_type(t) -> str:
    """Iceberg type → Glue/Hive type string — ref schema.go:95-149."""
    if isinstance(t, BooleanType):
        return "boolean"
    if isinstance(t, IntegerType):
        return "int"
    if isinstance(t, LongType):
        return "bigint"
    if isinstance(t, FloatType):
        return "float"
    if isinstance(t, DoubleType):
        return "double"
    if isinstance(t, DateType):
        return "date"
    if isinstance(t, TimeType):
        return "string"
    if isinstance(t, (TimestampType, TimestampTzType)):
        return "timestamp"
    if isinstance(t, StringType):
        return "string"
    if isinstance(t, UUIDType):
        return "string"  # UUID represented as string (schema.go:118)
    if isinstance(t, BinaryType):
        return "binary"
    if isinstance(t, DecimalType):
        return f"decimal({t.precision},{t.scale})"
    if isinstance(t, FixedType):
        return f"binary({t.length})"
    if isinstance(t, StructType):
        inner = ",".join(
            f"{f.name}:{glue_type(f.field_type)}" for f in t.fields
        )
        return f"struct<{inner}>"
    if isinstance(t, ListType):
        return f"array<{glue_type(t.element)}>"
    if isinstance(t, MapType):
        return f"map<{glue_type(t.key)},{glue_type(t.value)}>"
    return "string"  # schema.go:147 default


def _schema_columns(schema: Schema, is_current: bool) -> list[dict]:
    """ref schema.go:64-88 (fieldToGlueColumn)."""
    return [
        {
            "Name": f.name,
            "Comment": f.doc or "",
            "Type": glue_type(f.field_type),
            "Parameters": {
                FIELD_ID_KEY: str(f.field_id),
                FIELD_OPTIONAL_KEY: str(not f.required).lower(),
                FIELD_CURRENT_KEY: str(is_current).lower(),
            },
        }
        for f in schema.fields
    ]


def metadata_to_glue_columns(metadata: TableMetadata) -> list[dict]:
    """Merge the CURRENT schema's columns with any name not already
    present from historical schemas (marked current=false), sorted by
    field id — ref schema.go:33-62 (schemasToGlueColumns)."""
    results: dict[str, dict] = {}
    current = metadata.current_schema()
    for col in _schema_columns(current, True):
        results[col["Name"]] = col
    for schema in metadata.schemas:
        if schema.schema_id == current.schema_id:
            continue
        for col in _schema_columns(schema, False):
            results.setdefault(col["Name"], col)
    return sorted(
        results.values(), key=lambda c: int(c["Parameters"][FIELD_ID_KEY])
    )


class GlueCatalog(Catalog):
    name = "glue"

    def __init__(
        self,
        warehouse: str,
        client=None,
        properties: Optional[dict] = None,
        catalog_id: Optional[str] = None,
    ):
        self.warehouse = warehouse
        self.properties = dict(properties or {})
        self.catalog_id = catalog_id or self.properties.get("glue.id")
        if client is None:
            client = self._boto3_client()
        self.client = client

    def _boto3_client(self):
        """ref glue.go:94-126 (toAwsConfig): region/endpoint/static
        credentials from the glue.* properties; everything else follows
        the default AWS credential chain."""
        try:
            import boto3  # noqa: PLC0415 — optional dependency
        except ImportError as e:  # pragma: no cover — env-dependent
            raise ImportError(
                "GlueCatalog needs either an injected `client` or the "
                "boto3 package (pip install boto3)"
            ) from e
        kwargs = {}
        p = self.properties
        if p.get("glue.region"):
            kwargs["region_name"] = p["glue.region"]
        if p.get("glue.endpoint"):
            kwargs["endpoint_url"] = p["glue.endpoint"]
        if p.get("glue.access-key-id") or p.get("glue.secret-access-key"):
            kwargs["aws_access_key_id"] = p.get("glue.access-key-id")
            kwargs["aws_secret_access_key"] = p.get("glue.secret-access-key")
            if p.get("glue.session-token"):
                kwargs["aws_session_token"] = p.get("glue.session-token")
        return boto3.client("glue", **kwargs)

    # ------------------------------------------------------------ plumbing

    def _cid(self, kwargs: dict) -> dict:
        if self.catalog_id is not None:
            kwargs["CatalogId"] = self.catalog_id
        return kwargs

    @staticmethod
    def _split(identifier) -> tuple[str, str]:
        ns, tbl = _identifier(identifier)
        if "." in ns:
            # ref glue.go:709-723: Glue has exactly (database, table) —
            # no nested namespaces
            raise ValueError(
                f"Glue identifiers are database.table; got nested {ns!r}"
            )
        return ns, tbl

    def _get_glue_table(self, database: str, table_name: str) -> dict:
        """ref glue.go:623-649 (getTable): fetch + verify it IS an
        Iceberg table (TableType and the table_type parameter)."""
        try:
            resp = self.client.get_table(
                **self._cid({"DatabaseName": database, "Name": table_name})
            )
        except Exception as e:  # noqa: BLE001 — mapped by AWS error code
            if _aws_error_code(e) == "EntityNotFoundException":
                raise NoSuchTableError(f"{database}.{table_name}") from None
            raise
        tbl = resp["Table"]
        if tbl.get("TableType") != GLUE_TABLE_TYPE:
            raise NoSuchTableError(
                f"{database}.{table_name} is not an EXTERNAL_TABLE"
            )
        params = tbl.get("Parameters") or {}
        if params.get(PARAM_TABLE_TYPE, "").upper() != GLUE_TYPE_ICEBERG:
            raise NoSuchTableError(
                f"{database}.{table_name} is not an Iceberg table"
            )
        return tbl

    def _table_input(
        self,
        table_name: str,
        metadata: TableMetadata,
        metadata_location: str,
        previous: Optional[dict],
    ) -> dict:
        """ref glue.go:747-780 (constructParameters/constructTableInput):
        previous parameters carry over, the old metadata_location shifts
        to previous_metadata_location, table properties merge on top."""
        parameters: dict = {}
        if previous is not None:
            parameters.update(previous.get("Parameters") or {})
            if PARAM_METADATA_LOCATION in parameters:
                parameters[PARAM_PREV_METADATA_LOCATION] = parameters[
                    PARAM_METADATA_LOCATION
                ]
        parameters[PARAM_TABLE_TYPE] = GLUE_TYPE_ICEBERG
        parameters[PARAM_METADATA_LOCATION] = metadata_location
        parameters.update(metadata.properties)
        table_input = {
            "Name": table_name,
            "TableType": GLUE_TABLE_TYPE,
            "Parameters": parameters,
            "StorageDescriptor": {
                "Location": metadata.location,
                "Columns": metadata_to_glue_columns(metadata),
            },
        }
        if PROPS_KEY_DESCRIPTION in metadata.properties:
            table_input["Description"] = metadata.properties[
                PROPS_KEY_DESCRIPTION
            ]
        return table_input

    def _metadata_path(self, identifier, version: int) -> str:
        ns, tbl = self._split(identifier)
        return os.path.join(
            self.warehouse,
            ns,
            tbl,
            "metadata",
            f"{version:05d}-{_uuid.uuid4()}.metadata.json",
        )

    # -------------------------------------------------------------- tables

    def create_table(
        self, identifier, schema, spec=None, properties=None, location=None
    ):
        """ref glue.go:233-269: write the v1 metadata file, then
        CreateTable; a missing database surfaces as NoSuchNamespaceError,
        an existing table as TableAlreadyExistsError."""
        from .table import Table

        ns, tbl = self._split(identifier)
        location = location or os.path.join(self.warehouse, ns, tbl)
        md = self._new_metadata(schema, spec, location, properties)
        path = self._metadata_path(identifier, 1)
        _write_metadata_file(md, path)
        try:
            self.client.create_table(
                **self._cid(
                    {
                        "DatabaseName": ns,
                        "TableInput": self._table_input(tbl, md, path, None),
                    }
                )
            )
        except Exception as e:  # noqa: BLE001
            code = _aws_error_code(e)
            if code == "AlreadyExistsException":
                raise TableAlreadyExistsError(str(identifier)) from None
            if code == "EntityNotFoundException":
                raise NoSuchNamespaceError(ns) from None
            raise
        return Table(identifier, md, path, self)

    def load_table(self, identifier):
        """ref glue.go:651-693 (convertGlueToIceberg): resolve the
        metadata_location parameter and parse the metadata file."""
        from .table import Table

        ns, tbl = self._split(identifier)
        glue_table = self._get_glue_table(ns, tbl)
        loc = (glue_table.get("Parameters") or {}).get(PARAM_METADATA_LOCATION)
        if not loc:
            raise NoSuchTableError(
                f"missing {PARAM_METADATA_LOCATION} for {ns}.{tbl}"
            )
        return Table(identifier, parse_metadata_file(loc), loc, self)

    def register_table(self, identifier, metadata_location: str):
        """ref glue.go:271-300: adopt EXISTING metadata — the Glue row
        points at the file verbatim; nothing is rewritten."""
        from .table import Table

        ns, tbl = self._split(identifier)
        md = parse_metadata_file(metadata_location)
        try:
            self.client.create_table(
                **self._cid(
                    {
                        "DatabaseName": ns,
                        "TableInput": self._table_input(
                            tbl, md, metadata_location, None
                        ),
                    }
                )
            )
        except Exception as e:  # noqa: BLE001
            code = _aws_error_code(e)
            if code == "AlreadyExistsException":
                raise TableAlreadyExistsError(str(identifier)) from None
            if code == "EntityNotFoundException":
                raise NoSuchNamespaceError(ns) from None
            raise
        return Table(identifier, md, metadata_location, self)

    def drop_table(self, identifier) -> None:
        """ref glue.go:364-388: verify it is an Iceberg table first."""
        ns, tbl = self._split(identifier)
        self._get_glue_table(ns, tbl)
        self.client.delete_table(
            **self._cid({"DatabaseName": ns, "Name": tbl})
        )

    def rename_table(self, src, dst):
        """ref glue.go:390-454: Glue has no rename — create the target
        from the source's Glue object, then delete the source, rolling
        the new table back best-effort if the delete fails."""
        ns_s, t_s = self._split(src)
        ns_d, t_d = self._split(dst)
        if not self.namespace_exists(ns_d):
            raise NoSuchNamespaceError(ns_d)
        from_table = self._get_glue_table(ns_s, t_s)
        try:
            self.client.create_table(
                **self._cid(
                    {
                        "DatabaseName": ns_d,
                        "TableInput": {
                            "Name": t_d,
                            "TableType": from_table.get("TableType"),
                            "Owner": from_table.get("Owner"),
                            "Description": from_table.get("Description"),
                            "Parameters": from_table.get("Parameters"),
                            "StorageDescriptor": from_table.get(
                                "StorageDescriptor"
                            ),
                        },
                    }
                )
            )
        except Exception as e:  # noqa: BLE001
            if _aws_error_code(e) == "AlreadyExistsException":
                raise TableAlreadyExistsError(str(dst)) from None
            raise
        try:
            self.client.delete_table(
                **self._cid({"DatabaseName": ns_s, "Name": t_s})
            )
        except Exception:
            # best-effort rollback of the new table (glue.go:437-446)
            try:
                self.client.delete_table(
                    **self._cid({"DatabaseName": ns_d, "Name": t_d})
                )
            except Exception:  # noqa: BLE001,S110 — rollback best-effort
                pass
            raise
        return self.load_table(dst)

    def list_tables(self, namespace: str) -> list[tuple[str, str]]:
        """ref glue.go:177-207: paginate GetTables; only tables whose
        table_type parameter says ICEBERG are visible."""
        out, token = [], None
        while True:
            kwargs = self._cid({"DatabaseName": namespace})
            if token:
                kwargs["NextToken"] = token
            try:
                resp = self.client.get_tables(**kwargs)
            except Exception as e:  # noqa: BLE001
                if _aws_error_code(e) == "EntityNotFoundException":
                    raise NoSuchNamespaceError(namespace) from None
                raise
            for tbl in resp.get("TableList", []):
                params = tbl.get("Parameters") or {}
                if params.get(PARAM_TABLE_TYPE, "").upper() == GLUE_TYPE_ICEBERG:
                    out.append((namespace, tbl["Name"]))
            token = resp.get("NextToken")
            if not token:
                return out

    def commit_table(self, identifier, base_metadata_location, new_metadata) -> str:
        """Optimistic-locked CAS — ref glue.go:302-361 (CommitTable):
        write the new metadata file, re-read the Glue table, require its
        metadata_location to still equal our base, and UpdateTable with
        the VersionId we read; any concurrent bump fails the update.
        `skip-archive` (glue.skip-archive, default true per glue.go:65)
        rides along for high-frequency commit workloads."""
        ns, tbl = self._split(identifier)
        version = len(new_metadata.metadata_log) + 1
        new_path = self._metadata_path(identifier, version)
        _write_metadata_file(new_metadata, new_path)
        try:
            current = self._get_glue_table(ns, tbl)
        except NoSuchTableError:
            if base_metadata_location is not None:
                raise
            current = None
        if current is None:
            # staged-create first commit: the Glue object does not exist
            self.client.create_table(
                **self._cid(
                    {
                        "DatabaseName": ns,
                        "TableInput": self._table_input(
                            tbl, new_metadata, new_path, None
                        ),
                    }
                )
            )
            return new_path
        cur_loc = (current.get("Parameters") or {}).get(PARAM_METADATA_LOCATION)
        if cur_loc != base_metadata_location:
            raise CommitConflictError(
                f"CAS failed for {identifier}: base {base_metadata_location} "
                f"is stale (catalog has {cur_loc})"
            )
        version_id = current.get("VersionId")
        if version_id is None:
            raise CommitConflictError(
                f"cannot commit {ns}.{tbl}: Glue table version id missing"
            )
        skip_archive = (
            str(self.properties.get(SKIP_ARCHIVE_KEY, "true")).lower()
            != "false"
        )
        try:
            self.client.update_table(
                **self._cid(
                    {
                        "DatabaseName": ns,
                        "TableInput": self._table_input(
                            tbl, new_metadata, new_path, current
                        ),
                        "VersionId": version_id,
                        "SkipArchive": skip_archive,
                    }
                )
            )
        except Exception as e:  # noqa: BLE001
            if _aws_error_code(e) == "ConcurrentModificationException":
                raise CommitConflictError(
                    f"CAS failed for {identifier}: concurrent Glue commit"
                ) from None
            raise
        return new_path

    # ----------------------------------------------------------- namespaces

    def create_namespace(self, namespace: str, properties=None) -> None:
        """ref glue.go:475-490 + 782-802 (constructDatabaseInput):
        Description/location become first-class Database fields, the
        rest lands in Parameters."""
        props = dict(properties or {})
        db_input: dict = {"Name": namespace}
        parameters = {}
        for k, v in props.items():
            if k == PROPS_KEY_DESCRIPTION:
                db_input["Description"] = v
            elif k == PROPS_KEY_LOCATION:
                db_input["LocationUri"] = v
            else:
                parameters[k] = v
        db_input["Parameters"] = parameters
        try:
            self.client.create_database(
                **self._cid({"DatabaseInput": db_input})
            )
        except Exception as e:  # noqa: BLE001
            if _aws_error_code(e) == "AlreadyExistsException":
                raise ValueError(f"namespace {namespace} already exists") from None
            raise

    def _get_database(self, name: str) -> dict:
        try:
            resp = self.client.get_database(**self._cid({"Name": name}))
        except Exception as e:  # noqa: BLE001
            if _aws_error_code(e) == "EntityNotFoundException":
                raise NoSuchNamespaceError(name) from None
            raise
        return resp["Database"]

    def namespace_exists(self, namespace: str) -> bool:
        try:
            self._get_database(namespace)
            return True
        except NoSuchNamespaceError:
            return False

    def drop_namespace(self, namespace: str) -> None:
        self._get_database(namespace)  # exists check, glue.go:517-521
        self.client.delete_database(**self._cid({"Name": namespace}))

    def list_namespaces(self, parent: Optional[str] = None) -> list[str]:
        """ref glue.go:596-621: Glue namespaces are flat — a parent is
        an error, not an empty listing."""
        if parent:
            raise ValueError("hierarchical namespace is not supported")
        out, token = [], None
        while True:
            kwargs = self._cid({})
            if token:
                kwargs["NextToken"] = token
            resp = self.client.get_databases(**kwargs)
            out.extend(db["Name"] for db in resp.get("DatabaseList", []))
            token = resp.get("NextToken")
            if not token:
                return sorted(out)

    def load_namespace_properties(self, namespace: str) -> dict:
        """ref glue.go:533-556: Parameters + Description/LocationUri."""
        db = self._get_database(namespace)
        props = dict(db.get("Parameters") or {})
        if db.get("Description"):
            props[PROPS_KEY_DESCRIPTION] = db["Description"]
        if db.get("LocationUri"):
            props[PROPS_KEY_LOCATION] = db["LocationUri"]
        return props

    def update_namespace_properties(
        self, namespace: str, removals=(), updates=None
    ) -> None:
        """ref glue.go:568-594: read-modify-write of the Database."""
        current = self.load_namespace_properties(namespace)
        overlap = set(removals) & set(updates or {})
        if overlap:
            raise ValueError(
                f"properties in both removals and updates: {sorted(overlap)}"
            )
        for k in removals:
            current.pop(k, None)
        current.update(updates or {})
        db_input: dict = {"Name": namespace}
        parameters = {}
        for k, v in current.items():
            if k == PROPS_KEY_DESCRIPTION:
                db_input["Description"] = v
            elif k == PROPS_KEY_LOCATION:
                db_input["LocationUri"] = v
            else:
                parameters[k] = v
        db_input["Parameters"] = parameters
        self.client.update_database(
            **self._cid({"Name": namespace, "DatabaseInput": db_input})
        )
