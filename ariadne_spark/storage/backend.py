"""Storage-backend seam: which transactional table format holds index
state.

The reference persists FileList, the main index, and large indexes as
Delta tables and leans on Delta MERGE / OPTIMIZE / VACUUM
(reference: src/main/scala/dev/cjfravel/ariadne/FileList.scala:62-67,
IndexBuildOperations.scala:1319-1373, Index.scala:724-778). This
environment has no delta-spark, so the default backend is the
manifest-based LSM :class:`~ariadne_spark.storage.table.ParquetTable`
— but nothing above the storage layer depends on that choice. Every
consumer opens tables through :func:`open_table`, which selects the
backend from ``spark.ariadne.tableBackend``:

* ``parquet`` (default) — the LSM table; works everywhere.
* ``delta`` — :class:`DeltaBackend` below, a drop-in that maps the
  same contract onto delta-spark (MERGE for replace-per-key appends,
  ``optimize().executeCompaction()`` for compact, Delta VACUUM,
  ``versionAsOf`` time travel). Selecting it without delta-spark
  installed raises immediately with a clear message.
  **Status: seam present, Delta UNTESTED here** — delta-spark cannot
  be installed in this environment, so the DeltaBackend code path
  has never executed; treat it as a wiring template requiring a CI
  leg with delta-spark before production use. The backend-contract
  suite (tests/test_storage.py) runs against the LSM backend and a
  registered in-memory fake only.
* anything registered via :func:`register_backend` — tests (and
  downstream users) can plug custom backends without touching call
  sites.

The contract (duck-typed; ``ParquetTable`` is the reference
implementation):

========================  =============================================
``exists``                table has any committed state
``read(version=None)``    DataFrame of current (or time-travel) state,
                          with per-key replacement resolved; ``None``
                          if the table doesn't exist
``append(df)``            add rows; rows sharing a key with older data
                          supersede it (``dedup='last'``) or defer to
                          it (``dedup='first'``)
``upsert(df)``            alias of append under these semantics
``overwrite(df)``         replace the whole table
``delete_where(cond)``    remove matching rows
``compact()``             fold storage into its minimal layout
``vacuum()``              reclaim unreferenced files
``drop()``                delete the table entirely
``versions()``            committed versions, ascending
``num_segments``          fragmentation signal for auto-compaction
========================  =============================================
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .table import ParquetTable

_CONF_KEY = "spark.ariadne.tableBackend"

# name -> factory(spark, path, key_cols, dedup[, segment_unique]) ->
# backend instance (the 5th arg is an optional read-path hint, passed
# only when the factory's signature declares it)
_REGISTRY: dict = {}


def register_backend(name: str, factory) -> None:
    """Register a table-backend factory under ``name`` so
    ``spark.ariadne.tableBackend=name`` selects it."""
    _REGISTRY[name] = factory


# on-disk markers that identify which backend owns an existing table
_FORMAT_MARKERS = {"parquet": "_manifest", "delta": "_delta_log"}


def open_table(
    spark: SparkSession,
    path: str,
    key_cols: tuple[str, ...] = (),
    dedup: str = "last",
    segment_unique: bool = False,
):
    """Open the index-state table at ``path`` with the configured
    backend (``spark.ariadne.tableBackend``, default ``parquet``).

    Refuses to open a table that an OTHER known backend already owns:
    without the guard, flipping the conf over an existing store makes
    the new backend see an empty table — the engine would silently
    rebuild from scratch (or interleave two formats in one directory).
    """
    name = spark.conf.get(_CONF_KEY, "parquet")
    factory = _REGISTRY.get(name)
    if factory is None:
        raise ValueError(
            f"unknown {_CONF_KEY} {name!r}; registered: {sorted(_REGISTRY)}"
        )
    if name in _FORMAT_MARKERS:
        from .fs import get_fs, join as _join

        fs = get_fs(spark, path)
        for other, marker in _FORMAT_MARKERS.items():
            if other != name and fs.exists(_join(path, marker)):
                raise ValueError(
                    f"table {path} was written by the {other!r} backend "
                    f"but {_CONF_KEY}={name!r}; refusing to open — switch "
                    f"the conf back or migrate the table explicitly"
                )
    # ``segment_unique`` is a read-path hint (ParquetTable picks the
    # cheaper max_by dedup); factories that resolve upserts at write
    # time (Delta MERGE) don't need it, and externally registered
    # factories keep working with the original 4-arg signature.
    import inspect

    try:
        takes_hint = "segment_unique" in inspect.signature(factory).parameters
    except (TypeError, ValueError):  # builtins/C callables: be safe
        takes_hint = False
    if takes_hint:
        return factory(spark, path, key_cols, dedup, segment_unique=segment_unique)
    return factory(spark, path, key_cols, dedup)


register_backend("parquet", ParquetTable)


def migrate_table(
    spark: SparkSession,
    path: str,
    to_backend: str,
    key_cols: tuple[str, ...] = (),
    dedup: str = "last",
) -> None:
    """Rewrite the table at ``path`` from whatever backend owns it to
    ``to_backend`` — the explicit migration the :func:`open_table`
    mismatch guard points at.

    Reads the CURRENT state (per-key replacement resolved) with the
    owning backend, drops the old physical layout, and overwrites
    through the target backend. Run it under the index's maintenance
    lock — the swap is not concurrent-writer-safe (same caveat as any
    format conversion)."""
    from .fs import get_fs, join as _join

    fs = get_fs(spark, path)
    owner = None
    for name, marker in _FORMAT_MARKERS.items():
        if fs.exists(_join(path, marker)):
            owner = name
            break
    if owner is None:
        raise ValueError(f"no known backend owns {path}; nothing to migrate")
    if owner == to_backend:
        return
    if to_backend not in _REGISTRY:
        raise ValueError(
            f"unknown target backend {to_backend!r}; "
            f"registered: {sorted(_REGISTRY)}"
        )
    src = _REGISTRY[owner](spark, path, key_cols, dedup)
    df = src.read()
    if df is None:
        raise ValueError(f"{path} has no committed state to migrate")
    # Materialize off the source layout to a DURABLE sibling before
    # dropping it: a localCheckpoint lives in executor memory/disk, so
    # an executor or session loss between drop() and overwrite() would
    # lose the table permanently (r04 ADVICE). The parquet snapshot
    # survives any crash; a leftover .__migrate dir after one is plain
    # data, recoverable by hand.
    snap_path = path.rstrip("/") + ".__migrate"
    fs.delete(snap_path, recursive=True)  # stale leftover from a crash
    df.write.mode("overwrite").parquet(snap_path)
    snapshot = spark.read.parquet(snap_path)
    src.drop()
    dst = _REGISTRY[to_backend](spark, path, key_cols, dedup)
    dst.overwrite(snapshot)
    fs.delete(snap_path, recursive=True)


# --------------------------------------------------------------- delta

class DeltaBackend:
    """The reference's actual storage format, behind the same contract.

    Requires delta-spark (``pip install delta-spark`` plus the Delta
    SQL extension on the session). Mapping:

    * append/upsert → ``DeltaTable.merge`` keyed on ``key_cols``
      (``whenMatchedUpdateAll`` for ``dedup='last'``, insert-only for
      ``dedup='first'`` — the reference's FileList insert-if-absent,
      FileList.scala:62-67)
    * delete_where → Delta ``DELETE``
    * compact → ``optimize().executeCompaction()`` (OPTIMIZE,
      Index.scala:724-748)
    * vacuum → Delta ``VACUUM`` (Index.scala:752-778)
    * read(version) → ``versionAsOf`` time travel
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: tuple[str, ...] = (),
        dedup: str = "last",
    ) -> None:
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "spark.ariadne.tableBackend=delta requires delta-spark; "
                "install it or use the default parquet backend"
            ) from e
        self.spark = spark
        self.path = path.rstrip("/")
        self.key_cols = tuple(key_cols)
        assert dedup in ("last", "first")
        self.dedup = dedup

    def _delta(self):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path)

    @property
    def exists(self) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.path)

    def read(self, version: int | None = None) -> DataFrame | None:
        if not self.exists:
            return None
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(self.path)

    def append(self, df: DataFrame) -> None:
        if not self.exists or not self.key_cols:
            df.write.format("delta").mode("append").save(self.path)
            return
        cond = " AND ".join(f"t.`{c}` = s.`{c}`" for c in self.key_cols)
        merge = self._delta().alias("t").merge(df.alias("s"), cond)
        if self.dedup == "last":
            merge = merge.whenMatchedUpdateAll()
        merge.whenNotMatchedInsertAll().execute()

    upsert = append

    def overwrite(self, df: DataFrame) -> None:
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
            .save(self.path)
        )

    def delete_where(self, condition) -> None:
        if self.exists:
            self._delta().delete(condition)

    def compact(self) -> None:
        if self.exists:
            self._delta().optimize().executeCompaction()

    def vacuum(self, retention_hours: float = 168.0) -> None:
        if self.exists:
            self._delta().vacuum(retention_hours)

    def drop(self) -> None:
        from .fs import get_fs

        fs = get_fs(self.spark, self.path)
        if fs.exists(self.path):
            fs.delete(self.path, recursive=True)

    def versions(self) -> list[int]:
        if not self.exists:
            return []
        rows = self._delta().history().select("version").collect()
        return sorted(int(r["version"]) for r in rows)

    @property
    def num_segments(self) -> int:
        if not self.exists:
            return 0
        # data-file count is Delta's fragmentation signal (what
        # OPTIMIZE reduces), the analog of LSM segment count
        return int(self._delta().detail().collect()[0]["numFiles"] or 0)


register_backend("delta", DeltaBackend)
