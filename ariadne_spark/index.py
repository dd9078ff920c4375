"""The public ``Index`` API.

An Index is a named collection of per-file summaries over a set of
registered data-lake files (csv/json/parquet), supporting six index
types (regular, computed, exploded, bloom, temporal, range — one type
per column), incremental batched builds, file-level pruning queries,
and index-accelerated joins of any Spark join type (reference public
surface: src/main/scala/dev/cjfravel/ariadne/Index.scala:34-1279 and
the trait stack documented in SURVEY §0).

Usage::

    spark.conf.set("spark.ariadne.storagePath", "/tmp/ariadne")
    idx = Index.for_name("orders", schema=schema, format="parquet")
    idx.add_index("o_custkey")
    idx.add_range_index("o_totalprice")
    idx.add_files(["/lake/orders/day1.parquet", ...])
    idx.update()
    result = idx.join(customers_df, on=["o_custkey"])   # pruned join
"""

from __future__ import annotations

import json
import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import context
from .exceptions import (
    ColumnNotFoundError,
    ColumnNotIndexedError,
    FormatMismatchError,
    IndexNotFoundError,
    IndexTypeConflictError,
    InvalidFprError,
    MissingFormatError,
    NotArrayColumnError,
    NotTopLevelColumnError,
    ReservedColumnError,
    SchemaMismatchError,
    SchemaNotProvidedError,
    UnsupportedFormatError,
)
from .operators.build import build_index_rows, split_large_indexes
from .operators.join import apply_temporal_dedup, prune_metrics_local
from .plans.batching import analyze_files, create_batches
from .plans.locate import LocateStats
from .plans.locate import locate_files as _locate
from .sources.files import (
    FILENAME_COL,
    SUPPORTED_FORMATS,
    normalize_path,
    nested_root,
    read_pipeline,
)
from .storage.filelist import FileList
from .storage.fs import get_fs
from .storage.lock import IndexLock
from .storage.metadata import (
    BLOOM,
    COMPUTED,
    EXPLODED,
    RANGE,
    REGULAR,
    TEMPORAL,
    IndexConfig,
    IndexMetadata,
    load_metadata,
    save_metadata,
)
from .storage.paths import IndexPaths
from .storage.backend import open_table

log = logging.getLogger("ariadne")


class Index:
    """Handle to one named index under ``spark.ariadne.storagePath``."""

    # ------------------------------------------------------------ create

    def __init__(self, spark: SparkSession, meta: IndexMetadata, paths: IndexPaths):
        context.ship_package(spark)
        self.spark = spark
        self.meta = meta
        self.paths = paths
        self.fs = get_fs(spark, paths.root)
        self.filelist = FileList(spark, paths.filelist)
        # segment_unique: every update() batch appends exactly one row
        # per file (build.py attach_file_sizes frames a unique file
        # list), so reads take the max_by partial-agg dedup path
        self.table = open_table(
            spark, paths.index, key_cols=("filename",), segment_unique=True
        )
        self._selection: list[str] | None = None
        self._index_df_cache: DataFrame | None = None
        self._index_df_cached = False
        self._totals_cache: tuple[int, int] | None = None
        self._last_locate_stats = LocateStats()
        self._locate_memo: dict = {}

    @classmethod
    def for_name(
        cls,
        name: str,
        schema: T.StructType | str | None = None,
        format: str | None = None,
        read_options: dict | None = None,
        allow_schema_mismatch: bool = False,
        spark: SparkSession | None = None,
    ) -> "Index":
        """Open or create an index (reference factory:
        Index.scala:1149-1279 with identical schema/format rules)."""
        spark = spark or context.get_spark()
        conf = context.AriadneConf.load(spark)
        paths = IndexPaths(conf.storage_path, name)
        fs = get_fs(spark, paths.root)
        if isinstance(schema, str):
            schema = T.StructType.fromJson(json.loads(schema))

        existing = load_metadata(paths.metadata, name, fs=fs)
        if existing is None:
            if schema is None:
                raise SchemaNotProvidedError(name)
            if format is None:
                raise MissingFormatError(name)
            if format not in SUPPORTED_FORMATS:
                raise UnsupportedFormatError(format)
            meta = IndexMetadata(
                name=name,
                format=format,
                schema_json=schema.json(),
                read_options=dict(read_options or {}),
            )
            save_metadata(paths.metadata, meta, fs=fs)
            return cls(spark, meta, paths)

        if format is not None and format != existing.format:
            raise FormatMismatchError(f"{existing.format} != {format}")
        changed = False
        if schema is not None and json.loads(schema.json()) != json.loads(
            existing.schema_json
        ):
            if not allow_schema_mismatch:
                raise SchemaMismatchError(name)
            new_fields = {f.name for f in schema.fields}
            for cfg in existing.indexes:
                needed = cfg.source_column if cfg.type == EXPLODED else cfg.column
                if cfg.type != COMPUTED and needed not in new_fields:
                    raise SchemaMismatchError(
                        f"indexed column {needed} missing from new schema"
                    )
            existing.schema_json = schema.json()
            changed = True
        if read_options:
            merged = {**existing.read_options, **read_options}
            if merged != existing.read_options:
                existing.read_options = merged
                changed = True
        if changed:
            # reconnect is read-only unless schema/options actually merge
            # (new-wins merge semantics: reference Index.scala:1256-1273)
            save_metadata(paths.metadata, existing, fs=fs)
        return cls(spark, existing, paths)

    @classmethod
    def exists(cls, name: str, spark: SparkSession | None = None) -> bool:
        spark = spark or context.get_spark()
        conf = context.AriadneConf.load(spark)
        paths = IndexPaths(conf.storage_path, name)
        fs = get_fs(spark, paths.root)
        return load_metadata(paths.metadata, name, fs=fs) is not None

    # ------------------------------------------------------------ config

    @property
    def conf(self) -> context.AriadneConf:
        return context.AriadneConf.load(self.spark)

    @property
    def name(self) -> str:
        return self.meta.name

    def _schema_fields(self) -> dict[str, T.StructField]:
        return {f.name: f for f in self.meta.schema.fields}

    def _require_top_level(self, column: str) -> None:
        if "." in column:
            raise NotTopLevelColumnError(column)

    def _require_source_column(self, column: str) -> T.StructField:
        fields = self._schema_fields()
        if column not in fields:
            raise ColumnNotFoundError(column)
        return fields[column]

    def _virtual_columns(self) -> set[str]:
        return {
            c.column for c in self.meta.indexes if c.type in (COMPUTED, EXPLODED)
        }

    # internal columns of the index/filelist tables; indexing one would
    # collide at build time (reference reserves its staging columns the
    # same way, StagingRecoveryTests "internal staging column names")
    _RESERVED_COLUMNS = frozenset(
        {"filename", "file_size", "_ariadne_seq", "_ariadne_pick"}
    )

    def _register(self, cfg: IndexConfig) -> None:
        if (
            cfg.column in self._RESERVED_COLUMNS
            or cfg.column.startswith("_ariadne")
        ):
            raise ReservedColumnError(cfg.column)
        if cfg.type == BLOOM:
            fpr = 0.01 if cfg.fpr is None else cfg.fpr
            if not (0.0 < fpr < 1.0):
                raise InvalidFprError(f"fpr must be in (0, 1), got {cfg.fpr}")
        current = self.meta.config_for(cfg.column)
        if current is not None:
            if current.to_dict() == cfg.to_dict():
                return  # idempotent re-register
            raise IndexTypeConflictError(
                f"column {cfg.column!r} already has a {current.type} index"
            )
        if cfg.type in (REGULAR, TEMPORAL, RANGE) or (
            cfg.type == BLOOM and cfg.expression is None
        ):
            self._require_top_level(cfg.column)
            self._require_source_column(cfg.column)
        # alias-style configs (computed, exploded, expression blooms)
        # must not shadow a source column
        if (
            cfg.type in (COMPUTED, EXPLODED)
            or (cfg.type == BLOOM and cfg.expression is not None)
        ) and (cfg.column in self._schema_fields() or "." in cfg.column):
            raise IndexTypeConflictError(
                f"alias {cfg.column!r} collides with a source column"
            )
        if cfg.type == TEMPORAL:
            self._require_source_column(nested_root(cfg.timestamp_column))
        if cfg.type == EXPLODED:
            f = self._require_source_column(cfg.source_column)
            if not isinstance(f.dataType, T.ArrayType):
                raise NotArrayColumnError(cfg.source_column)
        self.meta.indexes.append(cfg)
        save_metadata(self.paths.metadata, self.meta, fs=self.fs)

    def add_index(self, column: str) -> "Index":
        self._register(IndexConfig(REGULAR, column))
        return self

    def add_computed_index(self, column: str, expression: str) -> "Index":
        self._register(IndexConfig(COMPUTED, column, expression=expression))
        return self

    def add_exploded_index(
        self, source_column: str, as_column: str, field: str | None = None
    ) -> "Index":
        self._register(
            IndexConfig(EXPLODED, as_column, source_column=source_column, field=field)
        )
        return self

    def add_bloom_index(
        self, column: str, fpr: float = 0.01, expression: str | None = None
    ) -> "Index":
        """Bloom index over ``column``, or — with ``expression`` — over
        a build-time Spark SQL expression aliased as ``column``. An
        array-valued expression blooms the distinct ELEMENTS, which
        lets the index prune files by DERIVED keys the rows don't
        store (e.g. per-row MinHash band keys — see
        ``operators.dedup.signature_store_index``). The alias is probe-
        only: it never appears in read/join output (unlike computed
        columns), exactly like the reference's bloom columns
        (BloomFilterOperations.scala:95-173)."""
        self._register(IndexConfig(BLOOM, column, fpr=fpr, expression=expression))
        return self

    def add_temporal_index(self, column: str, timestamp_column: str) -> "Index":
        self._register(
            IndexConfig(TEMPORAL, column, timestamp_column=timestamp_column)
        )
        return self

    def add_range_index(self, column: str) -> "Index":
        self._register(IndexConfig(RANGE, column))
        return self

    # ------------------------------------------------------------ files

    def add_file(self, path: str) -> "Index":
        return self.add_files([path])

    def _tables_fingerprint(self) -> tuple:
        """(filelist version, index-table version) — two manifest
        directory listings, no Spark job. Any committed write to
        either table changes it, including writes by OTHER handles or
        processes, so state keyed on it can never go stale silently."""
        return (
            self.filelist.table._latest_version(),
            self.table._latest_version(),
        )

    def add_files(self, paths: list[str]) -> "Index":
        """Register files with the FileList.

        r11 (guide §1.3/§6.2): a handle whose last ``update()``
        verified the index fully synced tracks the files added since
        as ``_pending_files``, fingerprint-guarded — the steady-state
        one-new-file micro-batch ``update()`` then skips the two
        filename set-diff read jobs entirely. Any fingerprint mismatch
        (another writer, a crash, a fresh handle) falls back to the
        exact FileList ∖ index computation, so the fast path can never
        hide an unindexed file."""
        names = [normalize_path(p) for p in paths]
        cur = self._tables_fingerprint()
        if cur == getattr(self, "_synced_fingerprint", None):
            base: set | None = set()
        elif (
            getattr(self, "_pending_files", None) is not None
            and cur == getattr(self, "_pending_fingerprint", None)
        ):
            base = set(self._pending_files)
        else:
            base = None
        self.filelist.add(names)
        if base is not None and names:
            self._pending_files = base | set(names)
            self._pending_fingerprint = self._tables_fingerprint()
        elif base is None:
            self._pending_files = None
        return self

    def has_file(self, path: str) -> bool:
        """Whether ``path`` is registered with this index (reference:
        Index.scala:107 ``hasFile`` — same FileList membership check,
        same path normalization as :meth:`add_files`)."""
        return self.filelist.contains(normalize_path(path))

    @property
    def files(self) -> DataFrame:
        return self.filelist.files

    @property
    def indexes(self) -> set[str]:
        """The union of all indexed column names across every index
        type (reference: Index.scala:372 ``indexes`` — the reference
        unions six per-type metadata collections; here every type
        lives in one IndexConfig list under its indexed/aliased
        column)."""
        return {cfg.column for cfg in self.meta.indexes}

    @property
    def index_df(self) -> DataFrame | None:
        """Current main-index frame; the DataFrame object is reused
        across locate/metrics/join steps of one operation so Spark
        analyzes the lineage once (invalidated by any write)."""
        if not self._index_df_cached:
            self._index_df_cache = self.table.read()
            self._index_df_cached = True
        return self._index_df_cache

    def _invalidate(self) -> None:
        self._index_df_cache = None
        self._index_df_cached = False
        self._totals_cache = None

    def _index_totals(self) -> tuple[int, int]:
        """(total_files, total_bytes) of the index — one agg job,
        cached until the next write (query-path metrics reuse it)."""
        if self._totals_cache is None:
            idx = self.index_df
            if idx is None:
                self._totals_cache = (0, 0)
            elif "file_size" in idx.columns:
                row = idx.agg(
                    F.count("*").alias("f"), F.sum("file_size").alias("b")
                ).collect()[0]
                self._totals_cache = (row["f"], row["b"] or 0)
            else:
                self._totals_cache = (idx.count(), 0)
        return self._totals_cache

    def large_df(self, column: str) -> DataFrame | None:
        t = open_table(
            self.spark, self.paths.large_index(column), key_cols=("filename",)
        )
        if not t.exists:
            return None
        df = t.read()
        if df is None:
            return None
        # A large row is live only while the main row's array is nulled
        # (re-indexing a file back under the limit supersedes its spill
        # rows without needing a delete — SURVEY S9's MERGE-delete analog).
        idx = self.index_df
        if idx is not None and column in idx.columns:
            df = df.join(
                idx.where(F.col(column).isNull()).select("filename"),
                "filename",
                "left_semi",
            )
        return df

    def unindexed_files(self) -> list[str]:
        """FileList ∖ index (reference J1: Index.scala:166-183).

        Manifest-backed tables take a two-scan fast path: raw
        filename-only reads of the live segments (explicit schema, so
        parquet prunes to one tiny column and no shuffle runs) with
        the set difference on the driver — exact because both tables
        key on filename (see ``ParquetTable.segment_dirs``), and
        driver-sized because ``update()`` materializes this list
        anyway. The replace-per-key read + anti-join plan this
        replaces cost 5 Spark jobs per update against 2."""
        from .storage.table import ParquetTable

        fl_tbl = self.filelist.table
        if isinstance(fl_tbl, ParquetTable) and isinstance(
            self.table, ParquetTable
        ):
            fl_dirs = fl_tbl.segment_dirs()
            if not fl_dirs:
                return []
            reader = self.spark.read.schema("filename string")
            fl_names = {
                r[0] for r in reader.parquet(*fl_dirs).collect()
            }
            ix_dirs = self.table.segment_dirs()
            ix_names = (
                {r[0] for r in reader.parquet(*ix_dirs).collect()}
                if ix_dirs
                else set()
            )
            return sorted(fl_names - ix_names)
        files = self.filelist.files.select("filename")
        idx = self.index_df
        if idx is None:
            return [r[0] for r in files.collect()]
        missing = files.join(idx.select("filename"), "filename", "left_anti")
        return [r[0] for r in missing.collect()]

    def _files_needing_column_update(self) -> list[str]:
        """Column backfill: if a newly-registered index column is absent
        from the stored table, every file must be re-indexed for it
        (reference: Index.scala:194-212)."""
        idx = self.index_df
        if idx is None:
            return []
        expected = {c.stored_column for c in self.meta.indexes}
        if expected - set(idx.columns):
            return self.filelist.filenames()
        return []

    # ------------------------------------------------------------ build

    def update(self, footer_stats: bool = False) -> "Index":
        """Bring the index up to date with the FileList (reference
        orchestration: Index.scala:635-693). Batched so per-batch
        collect_set state stays under largeIndexLimit; every batch
        commit is atomic, so a crashed update resumes where it left
        off (unindexed files are recomputed from FileList ∖ index).

        ``footer_stats=True`` builds RANGE indexes from parquet FOOTER
        statistics instead of scanning data — indexing an existing
        lake costs one footer read per file. Eligible only when every
        configured index is RANGE and the format is parquet; falls
        back to the scan build otherwise (and on any footer-read
        error). String ranges may be wider than scan-built (parquet
        truncates string stats) — pruning-safe, never lossy."""
        conf = self.conf
        lock = IndexLock(
            self.paths.locks,
            "update",
            timeout=conf.lock_timeout,
            retry_interval=conf.lock_retry_interval,
            max_wait=conf.lock_max_wait,
            fs=self.fs,
        )
        with lock, lock.heartbeat():
            # pending fast path (see add_files): when the only writes
            # since the last verified-synced update are this handle's
            # own add_files calls — proven by the version fingerprint,
            # re-checked here UNDER the lock — the unindexed set is
            # exactly the pending set, no read jobs needed.
            pend = getattr(self, "_pending_files", None)
            if pend is not None and (
                self._tables_fingerprint()
                == getattr(self, "_pending_fingerprint", None)
            ):
                unindexed = set(pend)
            else:
                unindexed = set(self.unindexed_files())
            todo = unindexed | set(self._files_needing_column_update())
            if not todo:
                self._pending_files = None
                self._synced_fingerprint = self._tables_fingerprint()
                return self
            use_footers = (
                footer_stats
                and self.meta.format == "parquet"
                and self.meta.indexes
                and all(c.type == RANGE for c in self.meta.indexes)
            )
            if use_footers or len(todo) == 1:
                # range structs hold no collect_set state, so batch
                # packing (and its HLL analysis scan) is unnecessary;
                # a single file likewise always forms exactly one
                # batch (oversize files get their own batch anyway),
                # so the analysis scan would only re-derive that —
                # skipping it saves 2 jobs on the steady-state
                # one-new-file micro-batch path
                batches = [sorted(todo)]
            else:
                analyses = analyze_files(
                    self.spark, self.meta, sorted(todo), self.meta.indexes
                )
                batches = create_batches(analyses, conf.large_index_limit)
            log.info(
                "index %s: updating %d files in %d batches",
                self.name, len(todo), len(batches),
            )
            array_cols = [
                c.column
                for c in self.meta.indexes
                if c.type in (REGULAR, COMPUTED, EXPLODED)
            ]
            temporal_cols = [
                c.column for c in self.meta.indexes if c.type == TEMPORAL
            ]
            for i, batch in enumerate(batches):
                if use_footers:
                    try:
                        from .operators.build import (
                            build_range_rows_from_footers,
                        )

                        rows = build_range_rows_from_footers(
                            self.spark, self.meta, batch
                        )
                    except Exception as e:
                        log.warning(
                            "index %s: footer-stats build failed (%s); "
                            "falling back to scan build", self.name, e,
                        )
                        rows = build_index_rows(self.spark, self.meta, batch)
                else:
                    rows = build_index_rows(self.spark, self.meta, batch)
                rows = rows.cache()
                try:
                    main_rows, large = split_large_indexes(
                        self.spark,
                        rows,
                        array_cols,
                        conf.large_index_limit,
                        conf.auto_bloom_fpr,
                        temporal_cols=temporal_cols,
                    )
                    for col, ldf in large.items():
                        open_table(
                            self.spark,
                            self.paths.large_index(col),
                            key_cols=("filename",),
                        ).append(ldf)
                    self.table.append(main_rows)
                    self._invalidate()
                finally:
                    rows.unpersist()
                self.meta.batches_since_compact += 1
                lock.refresh()
                if (
                    self.meta.batches_since_compact
                    >= conf.staging_consolidation_threshold
                ):
                    self._compact_tables()
                    self.meta.batches_since_compact = 0
            self.meta.update_count += 1
            self._refresh_size_accounting()
            if (
                conf.auto_compact_threshold is not None
                and self.meta.batches_since_compact >= conf.auto_compact_threshold
            ):
                self._compact_tables()
                self.meta.batches_since_compact = 0
            save_metadata(self.paths.metadata, self.meta, fs=self.fs)
            # every registered file is now indexed: record the synced
            # fingerprint (taken AFTER all appends/compactions) so the
            # next add_files→update pair can take the pending fast path
            self._pending_files = None
            self._synced_fingerprint = self._tables_fingerprint()
        return self

    # ------------------------------------------------------------ query

    def _large_tables(self, columns: list[str]) -> dict[str, DataFrame | None]:
        out: dict[str, DataFrame | None] = {}
        for col in columns:
            cfg = self.meta.config_for(col)
            if cfg is not None and cfg.type in (REGULAR, COMPUTED, EXPLODED, TEMPORAL):
                out[col] = self.large_df(col)
        return out

    def _locate_cache_key(self, query: dict, columns) -> tuple | None:
        """Memo key for a literal-dict locate, or None when the query
        is not cacheable (DataFrame join keys — arbitrary upstream
        plans). Keyed on the same manifest fingerprint the SQL surface
        uses, so ANY index data/metadata change invalidates. The JVM
        extension keeps the identical cache
        (AriadneState.locateCache, keyed fingerprint+predicates)."""
        from .plans.locate import Band

        if not isinstance(query, dict):
            return None
        parts = []
        for col in sorted(query):
            v = query[col]
            if isinstance(v, Band):
                parts.append((str(col), "band", repr(v)))
            elif isinstance(v, (list, tuple, set, frozenset)):
                try:
                    vals = tuple(sorted(map(repr, v)))
                except Exception:
                    return None
                parts.append((str(col), "in", vals))
            else:
                return None
        fingerprint = (
            self.table._latest_version(),
            self.filelist.table._latest_version(),
            self.fs.mtime(self.paths.metadata),
        )
        return (fingerprint, tuple(parts), tuple(columns or ()))

    def locate_files(self, query: "dict | DataFrame", columns: list[str] | None = None) -> list[str]:
        """Candidate files whose contents can match ``query``
        ({column: values} or a DataFrame of join keys). AND semantics
        across columns.

        Literal-dict locates memoize per handle (fingerprint-keyed, so
        index updates invalidate): a repeated dashboard/bench query
        pays the locate job once per index version."""
        key = None
        try:
            key = self._locate_cache_key(query, columns)
        except Exception:
            key = None
        if key is not None:
            hit = self._locate_memo.get(key)
            if hit is not None:
                files, stats = hit
                self._last_locate_stats = stats
                return list(files)
        min_bloom = self.conf.min_bloom_prune_bytes
        files, stats = _locate(
            self.spark,
            self.meta,
            self.index_df,
            self._large_tables(list(query.keys()) if isinstance(query, dict) else list(columns or [])),
            query,
            columns,
            repartition=self.conf.index_repartition_count,
            min_bloom_bytes=min_bloom,
            total_bytes=self._index_totals()[1] if min_bloom else None,
        )
        self._last_locate_stats = stats
        out = sorted(files)
        if key is not None:
            if len(self._locate_memo) >= 128:
                self._locate_memo.pop(next(iter(self._locate_memo)))
            self._locate_memo[key] = (list(out), stats)
        return out

    def select(self, *columns: str) -> "Index":
        """Restrict subsequent reads/joins to these columns (validated
        against source schema + virtual columns; reference P1)."""
        known = set(self._schema_fields()) | self._virtual_columns()
        for c in columns:
            if c not in known:
                raise ColumnNotFoundError(c)
        self._selection = list(columns) if columns else None
        return self

    def _applicable_temporal(self, available: set[str]) -> list[IndexConfig]:
        return [
            c
            for c in self.meta.indexes
            if c.type == TEMPORAL
            and c.column in available
        ]

    def read_files(
        self,
        files: list[str],
        extra_columns: list[str] | None = None,
        include_all_virtuals: bool = False,
    ) -> DataFrame:
        """Read a specific file subset through the full pipeline
        (computed + exploded columns, selection, temporal dedup).

        Exploded aliases MULTIPLY rows (inner explode), so they are
        applied only when actually requested — via the selection, the
        join/extra columns, or ``include_all_virtuals`` (the SQL-view
        surface, where the alias is part of the exposed schema).
        Computed columns are row-preserving and always available."""
        selection = list(self._selection) if self._selection else None
        extra = list(extra_columns or [])
        requested = set(extra) | set(selection or [])
        virtuals = [
            c
            for c in self.meta.indexes
            if c.type == COMPUTED
            or (
                c.type == EXPLODED
                and (include_all_virtuals or c.column in requested)
            )
        ]
        ts_roots: list[str] = []
        if selection is not None:
            needed = set(selection) | set(extra)
            # transparently include temporal timestamp roots so dedup
            # can run, then drop them (reference IndexJoinOperations.scala:247-271)
            for cfg in self._applicable_temporal(needed):
                root = nested_root(cfg.timestamp_column)
                if root not in needed:
                    ts_roots.append(root)
            selection = list(dict.fromkeys(selection + extra + ts_roots))
            virtuals = [v for v in virtuals if v.column in set(selection)]
        df = read_pipeline(
            self.spark,
            self.meta,
            files,
            virtual_configs=virtuals,
            selection=selection,
            explode_rows=True,
        )
        conf = self.conf
        if conf.repartition_data_files and files:
            # spread a skewed pruned read (few large files) across the
            # cluster before downstream joins/windows
            df = df.repartition(
                conf.index_repartition_count
                or self.spark.sparkContext.defaultParallelism
            )
        df = apply_temporal_dedup(df, self._applicable_temporal(set(df.columns)))
        if ts_roots:
            df = df.drop(*ts_roots)
        return df

    def read_all(self) -> DataFrame:
        """Full (unpruned) read exposing every virtual column — the
        frame behind the SQL views."""
        return self.read_files(
            self.filelist.filenames(), include_all_virtuals=True
        )

    def read_matching(self, values: dict, filter_rows: bool = True) -> DataFrame:
        """Pruned read: only files that can match ``values``; with
        ``filter_rows`` also re-apply the predicates row-level (file
        pruning alone is coarse — reference P8 returns all filters to
        Spark for post-scan application)."""
        for col in values:
            if self.meta.config_for(col) is None:
                raise ColumnNotIndexedError(col)
        files = self.locate_files(values)
        self._last_metrics = prune_metrics_local(
            self._last_locate_stats.sizes,
            self._index_totals(),
            self._last_locate_stats,
        )
        df = self.read_files(files, extra_columns=list(values.keys()))
        if filter_rows:
            from .plans.locate import Band

            for col, vals in values.items():
                if isinstance(vals, Band):
                    c = F.col(col)
                    if vals.lo is not None:
                        df = df.where(
                            (c >= vals.lo) if vals.lo_inc else (c > vals.lo)
                        )
                    if vals.hi is not None:
                        df = df.where(
                            (c <= vals.hi) if vals.hi_inc else (c < vals.hi)
                        )
                    continue
                vlist = [v for v in vals if v is not None]
                if len(vlist) <= 64:
                    df = df.where(F.col(col).isin(vlist))
                else:
                    # big literal IN-lists blow codegen; broadcast
                    # semi-join keeps the filter JVM-side and compact
                    vdf = self.spark.createDataFrame([(v,) for v in vlist], [col])
                    df = df.join(F.broadcast(vdf), col, "left_semi")
        return df

    def located_data(
        self, other: DataFrame, on: list[str] | str
    ) -> DataFrame:
        """The indexed data pruned to files that can match ``other``'s
        key values, temporal-deduped — the reference's ``joinDf``
        (IndexJoinOperations.scala:373-400; join columns must be
        indexed, :129-137). Both join directions build on this."""
        cols = [on] if isinstance(on, str) else list(on)
        for c in cols:
            if self.meta.config_for(c) is None:
                raise ColumnNotIndexedError(c)
            if c not in other.columns:
                raise ColumnNotFoundError(f"{c} not in other DataFrame")
        values_df = other.select(*cols)
        min_bloom = self.conf.min_bloom_prune_bytes
        files, stats = _locate(
            self.spark,
            self.meta,
            self.index_df,
            self._large_tables(cols),
            values_df,
            cols,
            repartition=self.conf.index_repartition_count,
            min_bloom_bytes=min_bloom,
            total_bytes=self._index_totals()[1] if min_bloom else None,
        )
        self._last_locate_stats = stats
        self._last_metrics = prune_metrics_local(
            stats.sizes, self._index_totals(), stats
        )
        return self.read_files(sorted(files), extra_columns=cols)

    def join(
        self,
        other: DataFrame,
        on: list[str] | str,
        how: str = "inner",
    ) -> DataFrame:
        """Index-accelerated equi-join (USING-style): prune files by the
        other side's key values, read only those, temporal-dedup, then
        plain Spark join with the located data on the LEFT (reference
        J7: IndexJoinOperations.scala:373-400)."""
        cols = [on] if isinstance(on, str) else list(on)
        return self.located_data(other, cols).join(other, cols, how)

    def join_from(
        self,
        other: DataFrame,
        on: list[str] | str,
        how: str = "inner",
    ) -> DataFrame:
        """Reverse-direction join: ``other`` on the LEFT, located data
        on the right — the reference's implicit ``DataFrameOps.join``
        (Index.scala:1296-1323). Since pruning only removes files whose
        rows cannot match ``other``, results are exact for inner/left/
        semi/anti joins; right/full joins would need the unmatched data
        rows too, same as the reference."""
        cols = [on] if isinstance(on, str) else list(on)
        return other.join(self.located_data(other, cols), cols, how)

    # ------------------------------------------------------------ stats

    def stats(self) -> DataFrame:
        """Per-index-column diagnostics (reference A8:
        IndexQueryOperations.scala:911-972)."""
        idx = self.index_df
        rows = []
        schema = T.StructType(
            [
                T.StructField("column", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("files", T.LongType()),
                T.StructField("min_values", T.LongType()),
                T.StructField("max_values", T.LongType()),
                T.StructField("avg_values", T.DoubleType()),
                T.StructField("stddev_values", T.DoubleType()),
                T.StructField("median_values", T.DoubleType()),
            ]
        )
        if idx is None:
            return self.spark.createDataFrame([], schema)
        for cfg in self.meta.indexes:
            sc = cfg.stored_column
            if sc not in idx.columns:
                continue
            if cfg.type in (REGULAR, COMPUTED, EXPLODED, TEMPORAL):
                size = F.size(F.col(sc))
                agg = idx.where(F.col(sc).isNotNull()).agg(
                    F.count("*").alias("files"),
                    F.min(size).alias("mn"),
                    F.max(size).alias("mx"),
                    F.avg(size).alias("av"),
                    F.stddev(size).alias("sd"),
                    F.percentile_approx(size, 0.5).alias("md"),
                ).collect()[0]
                rows.append(
                    (cfg.column, cfg.type, agg["files"], agg["mn"], agg["mx"],
                     agg["av"], agg["sd"], float(agg["md"]) if agg["md"] is not None else None)
                )
            else:
                n = idx.where(F.col(sc).isNotNull()).count()
                rows.append((cfg.column, cfg.type, n, None, None, None, None, None))
        return self.spark.createDataFrame(rows, schema)

    # ------------------------------------------------------------ lifecycle

    def delete_files(self, paths: list[str]) -> "Index":
        """Remove files from the index + FileList (reference:
        Index.scala:532-616)."""
        names = [normalize_path(p) for p in paths]
        cond = F.col("filename").isin(names)
        if self.table.exists:
            self.table.delete_where(cond)
        self._invalidate()
        for cfg in self.meta.indexes:
            t = open_table(
                self.spark, self.paths.large_index(cfg.column), key_cols=("filename",)
            )
            if t.exists:
                t.delete_where(cond)
        self.filelist.remove(names)
        self._refresh_size_accounting()
        save_metadata(self.paths.metadata, self.meta, fs=self.fs)
        return self

    def _refresh_size_accounting(self) -> None:
        """Persisted total of indexed source bytes (the reference keeps
        the same counter for its pruning metrics and size reporting —
        metadata v9's total_indexed_file_size). Recomputed exactly from
        the index table: one tiny aggregation beats incremental
        bookkeeping that can drift."""
        from .storage.table import ParquetTable

        if isinstance(self.table, ParquetTable):
            # column-pruned replace-per-key read: the default plan
            # packs every index column into the max_by struct, so this
            # one SUM would otherwise rescan every bloom blob and
            # value array after each update
            idx = (
                self.table.read(columns=["file_size"])
                if self.table.exists
                else None
            )
        else:
            idx = self.index_df
        if idx is None:
            self.meta.total_indexed_bytes = 0
            return
        row = idx.agg(F.sum("file_size")).collect()[0]
        self.meta.total_indexed_bytes = int(row[0] or 0)

    def _compact_tables(self) -> None:
        self.table.compact()
        self._invalidate()
        for cfg in self.meta.indexes:
            t = open_table(
                self.spark, self.paths.large_index(cfg.column), key_cols=("filename",)
            )
            if t.exists:
                t.compact()

    def compact(self) -> "Index":
        self._compact_tables()
        self.meta.batches_since_compact = 0
        save_metadata(self.paths.metadata, self.meta, fs=self.fs)
        return self

    def vacuum(self, retention_hours: float = 168.0) -> "Index":
        """Reclaim dead storage across the index's tables, keeping
        ``retention_hours`` of history (reference: Index.scala:761
        ``vacuum(retentionHours: Int = 168)`` — same default, same
        passthrough to every owned table; here LSM segments/manifests
        younger than the window survive so concurrent readers pinned
        to a recent version never lose files mid-scan, mirroring
        Delta's VACUUM retention contract)."""
        self.table.vacuum(retention_hours=retention_hours)
        for cfg in self.meta.indexes:
            t = open_table(
                self.spark, self.paths.large_index(cfg.column), key_cols=("filename",)
            )
            if t.exists:
                t.vacuum(retention_hours=retention_hours)
        self.filelist.table.vacuum(retention_hours=retention_hours)
        return self

    def drop_storage(self) -> None:
        if self.fs.exists(self.paths.root):
            self.fs.delete(self.paths.root, recursive=True)
