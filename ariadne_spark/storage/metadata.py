"""Index metadata document (metadata.json).

One JSON document per index holding format, the full Spark schema as
schema JSON, the index configurations, persisted read options and
lifecycle counters — the same document shape the reference persists
(reference: src/main/scala/dev/cjfravel/ariadne/IndexMetadata.scala:109-123,
atomic write at IndexMetadataOperations.scala:125-155). Versions are
retained from day one so a future layout change never needs the
reference's retrofitted migration machinery (SURVEY §7.3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql.types import StructType

METADATA_VERSION = 1
STORAGE_FORMAT_VERSION = 1

# index types (one per column, mutually exclusive — reference:
# IndexBuildOperations.scala:124-159)
REGULAR = "regular"
COMPUTED = "computed"
EXPLODED = "exploded"
BLOOM = "bloom"
TEMPORAL = "temporal"
RANGE = "range"

ALL_TYPES = (REGULAR, COMPUTED, EXPLODED, BLOOM, TEMPORAL, RANGE)


@dataclass
class IndexConfig:
    """One configured index.

    ``column``  — the indexed/aliased column (top-level).
    regular:  column is a source column.
    computed: ``expression`` is any Spark SQL scalar expression; its
              value is indexed under ``column``.
    exploded: ``source_column`` is an ArrayType column; ``field`` an
              optional struct field path inside the elements; distinct
              element values are indexed under ``column`` (the alias).
    bloom:    serialized bloom filter of string-ized values, stored as
              ``bloom_{column}``; ``fpr`` false-positive rate. With
              ``expression`` the column is an ALIAS for any Spark SQL
              expression evaluated at build time; an ARRAY-valued
              expression blooms the distinct ELEMENTS (the file-index-
              over-derived-keys shape, e.g. per-row LSH band keys).
    temporal: per-value latest ``timestamp_column`` (may be nested),
              stored as array<struct<value,max_ts>> under ``column``.
    range:    struct<min,max> stored as ``range_{column}``.
    """

    type: str
    column: str
    expression: str | None = None
    source_column: str | None = None
    field: str | None = None
    timestamp_column: str | None = None
    fpr: float | None = None

    def to_dict(self) -> dict:
        return {k: v for k, v in self.__dict__.items() if v is not None}

    @staticmethod
    def from_dict(d: dict) -> "IndexConfig":
        return IndexConfig(**d)

    @property
    def stored_column(self) -> str:
        if self.type == BLOOM:
            return f"bloom_{self.column}"
        if self.type == RANGE:
            return f"range_{self.column}"
        return self.column


@dataclass
class IndexMetadata:
    name: str
    format: str
    schema_json: str
    indexes: list[IndexConfig] = field(default_factory=list)
    read_options: dict = field(default_factory=dict)
    update_count: int = 0
    batches_since_compact: int = 0
    total_indexed_bytes: int = 0
    metadata_version: int = METADATA_VERSION
    storage_format_version: int = STORAGE_FORMAT_VERSION

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self.schema_json))

    def config_for(self, column: str) -> IndexConfig | None:
        for c in self.indexes:
            if c.column == column:
                return c
        return None

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "format": self.format,
                "schema": json.loads(self.schema_json),
                "indexes": [c.to_dict() for c in self.indexes],
                "read_options": self.read_options,
                "update_count": self.update_count,
                "batches_since_compact": self.batches_since_compact,
                "total_indexed_bytes": self.total_indexed_bytes,
                "metadata_version": self.metadata_version,
                "storage_format_version": self.storage_format_version,
            },
            indent=2,
            sort_keys=True,
        )

    @staticmethod
    def from_json(name: str, raw: str) -> "IndexMetadata":
        from ..exceptions import InvalidMetadataError

        try:
            d = json.loads(raw)
        except ValueError as e:
            raise InvalidMetadataError(f"{name}: unparseable metadata: {e}")
        # Forward-compat guard FIRST, before required-field validation:
        # a newer engine may have renamed format/schema fields, and the
        # whole point of the guard is the "upgrade ariadne-spark to
        # read it" signal — field checks running first would mask it
        # as InvalidMetadataError (r04 ADVICE). Non-integer version
        # values (a newer scheme like "2.1") wrap in the same
        # Unsupported error rather than an unwrapped ValueError.
        # (reference: UnsupportedMetadataVersionException /
        # UnsupportedStorageFormatVersionException)
        from ..exceptions import (
            UnsupportedMetadataVersionError,
            UnsupportedStorageFormatVersionError,
        )

        mv = d.get("metadata_version", METADATA_VERSION)
        sv = d.get("storage_format_version", STORAGE_FORMAT_VERSION)
        try:
            mv_newer = int(mv) > METADATA_VERSION
        except (TypeError, ValueError):
            mv_newer = True  # unrecognizable scheme = newer than us
        if mv_newer:
            raise UnsupportedMetadataVersionError(
                f"{name}: metadata_version {mv!r} > supported "
                f"{METADATA_VERSION}; upgrade ariadne-spark to read it"
            )
        try:
            sv_newer = int(sv) > STORAGE_FORMAT_VERSION
        except (TypeError, ValueError):
            sv_newer = True
        if sv_newer:
            raise UnsupportedStorageFormatVersionError(
                f"{name}: storage_format_version {sv!r} > supported "
                f"{STORAGE_FORMAT_VERSION}; upgrade ariadne-spark to read it"
            )
        for req in ("format", "schema"):
            if req not in d:
                raise InvalidMetadataError(
                    f"{name}: metadata missing required field {req!r}"
                )
        return IndexMetadata(
            name=name,
            format=d["format"],
            schema_json=json.dumps(d["schema"]),
            indexes=[IndexConfig.from_dict(c) for c in d.get("indexes", [])],
            read_options=d.get("read_options", {}),
            update_count=d.get("update_count", 0),
            batches_since_compact=d.get("batches_since_compact", 0),
            total_indexed_bytes=d.get("total_indexed_bytes", 0),
            metadata_version=d.get("metadata_version", METADATA_VERSION),
            storage_format_version=d.get(
                "storage_format_version", STORAGE_FORMAT_VERSION
            ),
        )


def load_metadata(path: str, name: str, fs=None) -> IndexMetadata | None:
    from .fs import PosixFS

    fs = fs if fs is not None else PosixFS()
    raw = fs.read_text(path)
    if raw is None:
        return None
    return IndexMetadata.from_json(name, raw)


def save_metadata(path: str, meta: IndexMetadata, fs=None) -> None:
    """Atomic write: temp file in the same dir + validate + rename
    (the reference's write-validate-rename pattern,
    IndexMetadataOperations.scala:125-155)."""
    from .fs import PosixFS

    fs = fs if fs is not None else PosixFS()
    doc = meta.to_json()
    IndexMetadata.from_json(meta.name, doc)  # validate round-trip
    fs.mkdirs(path.rsplit("/", 1)[0])
    fs.write_atomic(path, doc)
