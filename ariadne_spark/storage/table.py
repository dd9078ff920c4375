"""Manifest-based versioned parquet tables.

The reference stores its index state in Delta tables and leans on
Delta MERGE for upsert/delete and OPTIMIZE/VACUUM for maintenance
(reference: src/main/scala/dev/cjfravel/ariadne/IndexBuildOperations.scala:1319-1373,
Index.scala:724-778). delta-spark is not available in this
environment, so this module provides the minimal transactional table
the engine needs, built on plain parquet + an atomic JSON manifest:

* A table directory holds immutable parquet *segments* (one directory
  per commit) plus ``_manifest/v{N}.json`` files. The manifest with
  the highest N is the current table state; commits are atomic via
  ``O_CREAT|O_EXCL`` manifest creation (same primitive the reference
  uses for its lock files, IndexLock.scala:396-411).
* Writes are LSM-style appends: a new segment with a higher sequence
  number. Readers resolve upserts by keeping, per key, only the rows
  of the newest segment containing that key — the read-time analog of
  ``MERGE ... whenMatchedUpdateAll`` with replace-per-key semantics.
* ``compact()`` folds all segments into one (the analog of staging
  consolidation + OPTIMIZE); ``vacuum()`` deletes unreferenced files.

Scale note (r09, replaces the window dedup): multi-segment reads
resolve replace-per-key without any Window node. Tables whose
segments hold at most one row per key (``segment_unique=True`` — the
main index and the FileList append exactly one row per filename per
batch) use a ``max_by(struct(...), seq)`` / ``min_by`` partial-agg
groupBy: map-side combine collapses each partition to one candidate
row per key, so the single shuffle carries at most one row per key
per map partition — strictly less than the window's
every-segment-copy shuffle, and no sort. Multi-row-per-key tables
(the exploded ``(filename, value)`` large indexes) aggregate the
per-key winning sequence from a column-pruned scan (filename + seq
only) and broadcast-semi-join it back: the wide exploded side is
never shuffled at all. The broadcast hint is forced only while the
table's on-disk bytes stay under
``spark.ariadne.winnerBroadcastMaxBytes`` (default 256 MiB); above
it AQE decides from the agg's actual output size, so a huge
uncompacted store degrades to a shuffle join instead of a driver
OOM. The winner set is O(distinct keys) = O(files)
— the same file-cardinality driver contract the locate path already
has (``plans/locate.py`` returns the pruned file list). The
single-segment fast path (the common state after compaction) skips
all of it.

Storage backends: local paths use POSIX O_EXCL (truly atomic);
remote URIs (``hdfs:``, ``s3a:``, ``abfs:``) go through the Hadoop
``FileSystem`` API (``storage/fs.py``) — atomic create-no-overwrite on
HDFS/ABFS, check-then-write on raw S3A (the same hazard the reference
accepts for its Hadoop-FS lock files, IndexLock.scala:396-411).
"""

from __future__ import annotations

import json
import sys
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import TableCommitConflictError
from .fs import get_fs, join as _join

_MANIFEST_DIR = "_manifest"
_SEQ_COL = "_ariadne_seq"


class ParquetTable:
    """A versioned parquet table with replace-per-key append semantics.

    ``key_cols`` define the replacement key: an append whose rows share
    a key with older segments supersedes *all* older rows of that key
    (``dedup='last'``) or is ignored in favor of them (``dedup='first'``,
    the insert-if-absent semantics the FileList needs).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: tuple[str, ...] = (),
        dedup: str = "last",
        segment_unique: bool = False,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.fs = get_fs(spark, self.path)
        self.key_cols = tuple(key_cols)
        assert dedup in ("last", "first")
        self.dedup = dedup
        # declared by the owner: every segment holds at most one row
        # per key (enables the cheaper max_by read path; a multi-row
        # segment under this flag would silently lose rows, so only
        # writers that append keyed rows exactly once set it)
        self.segment_unique = segment_unique

    # ------------------------------------------------------------ manifest

    def _manifest_dir(self) -> str:
        return _join(self.path, _MANIFEST_DIR)

    def _versions(self) -> list[int]:
        return sorted(
            int(f[1:-5])
            for f in self.fs.list_names(self._manifest_dir())
            if f.startswith("v") and f.endswith(".json")
        )

    def _latest_version(self) -> int | None:
        versions = self._versions()
        return versions[-1] if versions else None

    def _read_manifest(self, version: int | None = None) -> dict | None:
        v = self._latest_version() if version is None else version
        if v is None:
            return None
        raw = self.fs.read_text(_join(self._manifest_dir(), f"v{v:020d}.json"))
        if raw is None:
            return None
        m = json.loads(raw)
        m["version"] = v
        return m

    def versions(self) -> list[int]:
        """All committed manifest versions, ascending (time travel:
        pass one to :meth:`read`). Older versions stay readable until
        :meth:`vacuum` reclaims segments no current manifest
        references — the Delta-style retention caveat."""
        return self._versions()

    def _commit(
        self, build_segments, retries: int = 20, extra: dict | None = None
    ) -> None:
        """Optimistically commit: recompute segments from the latest
        manifest, write v+1 create-exclusive, retry on collision.
        ``extra`` is a small JSON-able dict stored in the manifest
        under ``"extra"`` — application metadata (e.g. a streaming
        sink's last committed batch id) that versions ATOMICALLY with
        the data and reads back without any Spark job
        (:meth:`manifest_extra`)."""
        self.fs.mkdirs(self._manifest_dir())
        for _ in range(retries):
            current = self._read_manifest()
            version = (current["version"] if current else 0) + 1
            segments = build_segments(current["segments"] if current else [])
            body: dict = {"segments": segments}
            if extra:
                body["extra"] = extra
            doc = json.dumps(body, indent=0)
            target = _join(self._manifest_dir(), f"v{version:020d}.json")
            if self.fs.create_exclusive(target, doc):
                return
        raise TableCommitConflictError(self.path)

    def manifest_extra(self) -> dict:
        """The ``extra`` metadata dict of the latest manifest (empty if
        none) — one small JSON read, no Spark job."""
        m = self._read_manifest()
        return (m or {}).get("extra", {}) or {}

    # ------------------------------------------------------------ reads

    def _read_segment(self, s: dict) -> DataFrame:
        """One segment as a DataFrame. Segments committed since r11
        carry their writer's schema in the manifest, so the read runs
        with an EXPLICIT schema — without it every
        ``spark.read.parquet`` pays a footer schema-inference job, one
        per segment per read call, which dominated the per-micro-batch
        fixed cost of the streaming/incremental paths (guide §6.2).
        Pre-r11 manifests (no stored schema) fall back to inference."""
        reader = self.spark.read
        sch = s.get("schema")
        if sch:
            reader = reader.schema(T.StructType.fromJson(json.loads(sch)))
        return reader.parquet(_join(self.path, s["dir"]))

    @property
    def exists(self) -> bool:
        return self._latest_version() is not None

    def read(
        self, version: int | None = None, columns: list[str] | None = None
    ) -> DataFrame | None:
        """Table state as of ``version`` (default: latest), or None if
        the table doesn't exist. Unknown versions raise with the
        available range; versions older than the last vacuum may
        reference reclaimed segments and fail at scan time.

        ``columns`` narrows the result to those columns (keys are
        still read internally to resolve replace-per-key). Pass it
        when only a few columns matter: the default multi-segment plan
        packs EVERY non-key column into the ``max_by`` struct, which
        defeats parquet column pruning — a caller summing one numeric
        column would otherwise scan every bloom blob and value array
        in the table."""
        if version is not None:
            vs = self._versions()  # one listing for check + message
            if version not in vs:
                raise ValueError(
                    f"version {version} not found for {self.path}; "
                    f"available: {vs}"
                )
        m = self._read_manifest(version)
        if m is None:
            return None
        segments = m["segments"]
        if not segments:
            return None
        if len(segments) == 1 or not self.key_cols:
            dfs = [self._read_segment(s) for s in segments]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
            return out.select(*columns) if columns is not None else out
        dfs = [
            self._read_segment(s).withColumn(_SEQ_COL, F.lit(s["seq"]))
            for s in segments
        ]
        union = dfs[0]
        for d in dfs[1:]:
            union = union.unionByName(d, allowMissingColumns=True)
        keys = list(self.key_cols)
        if columns is not None:
            # prune BEFORE the agg so the parquet scan reads only the
            # requested columns (+ keys); replace-per-key semantics
            # are unchanged — dedup picks the same winning row/segment
            keep = list(
                dict.fromkeys(keys + list(columns) + [_SEQ_COL])
            )
            union = union.select(
                *[c for c in union.columns if c in keep]
            )
        data_cols = [c for c in union.columns if c != _SEQ_COL]
        out_cols = list(columns) if columns is not None else data_cols
        if self.segment_unique:
            # ≤1 row per key per segment: a max_by/min_by partial-agg
            # groupBy resolves replace-per-key in ONE shuffle whose
            # map-side combine already collapsed each partition to one
            # candidate row per key — no Window, no sort (same
            # transform as the W1 dedup in operators/join.py:53-63).
            pick_fn = F.max_by if self.dedup == "last" else F.min_by
            others = [c for c in data_cols if c not in self.key_cols]
            if not others:  # keys-only table: all rows per key equal
                return union.select(*keys).distinct().select(*out_cols)
            packed = union.groupBy(*keys).agg(
                pick_fn(F.struct(*others), F.col(_SEQ_COL)).alias("__row")
            )
            return packed.select(
                *keys, *[F.col("__row")[c].alias(c) for c in others]
            ).select(*out_cols)
        # multi-row-per-key segments (exploded large indexes): find
        # each key's winning segment from a column-pruned scan (the
        # agg reads only the key columns; seq is a literal), then
        # broadcast the O(distinct keys) winner set back over the wide
        # side — the exploded rows are never shuffled. Winner columns
        # are renamed to fresh attributes so the self-referential join
        # resolves unambiguously.
        pick = F.max(_SEQ_COL) if self.dedup == "last" else F.min(_SEQ_COL)
        winners = (
            union.groupBy(*keys)
            .agg(pick.alias("__pick"))
            .select(
                *[F.col(k).alias(f"__w_{k}") for k in keys], "__pick"
            )
        )
        cond = F.col(_SEQ_COL) == F.col("__pick")
        for k in keys:
            cond = cond & F.col(k).eqNullSafe(F.col(f"__w_{k}"))
        # the winner set is O(distinct keys) with no a-priori cap, so
        # FORCING the broadcast is only safe while the underlying data
        # is provably small; above the threshold drop the hint and let
        # AQE pick at runtime from the agg's ACTUAL output size (it
        # still broadcasts when the winner set turns out small, and
        # degrades to a shuffle join instead of an executor/driver OOM
        # when it doesn't).
        if self._bytes_of(segments) <= self._winner_broadcast_max_bytes():
            winners = F.broadcast(winners)
        out = union.join(winners, cond, "left_semi").drop(_SEQ_COL)
        return out.select(*out_cols) if columns is not None else out

    def _bytes_of(self, segments: list[dict]) -> int:
        """Total on-disk bytes of the referenced segments (driver-side
        listing, O(files)); conservative ``maxsize`` on any failure so
        an unlistable store never forces a broadcast."""
        try:
            total = 0
            for s in segments:
                files = self.fs.list_files(_join(self.path, s["dir"]))
                total += sum(
                    sz
                    for f, sz in zip(files, self.fs.sizes(files))
                    if f.endswith(".parquet") and sz
                )
            return total
        except Exception:
            return sys.maxsize

    def _winner_broadcast_max_bytes(self) -> int:
        raw = self.spark.conf.get(
            "spark.ariadne.winnerBroadcastMaxBytes", str(256 << 20)
        )
        try:
            return int(raw)
        except (TypeError, ValueError):
            return 256 << 20

    # ------------------------------------------------------------ writes

    def _write_segment(self, df: DataFrame) -> str:
        seg = f"data/seg-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(_join(self.path, seg))
        return seg

    def append(self, df: DataFrame) -> None:
        """Append a segment; per-key replacement resolves at read time."""
        self._check_segment_unique(df)
        seg = self._write_segment(df)
        sch = df.schema.json()

        def build(old):
            next_seq = max([s["seq"] for s in old], default=0) + 1
            return old + [{"seq": next_seq, "dir": seg, "schema": sch}]

        self._commit(build)

    # upsert IS append under replace-per-key read semantics
    upsert = append

    def _check_segment_unique(self, df: DataFrame) -> None:
        """Opt-in invariant check (``spark.ariadne.debugInvariants``):
        ``segment_unique=True`` promises at most one row per key per
        appended segment — a violating writer would silently LOSE rows
        at read time (the max_by path keeps one candidate per key).
        The check costs one aggregation job, so it is off by default
        and enabled in tests/debug runs to fail loudly instead."""
        if not (self.segment_unique and self.key_cols):
            return
        if str(
            self.spark.conf.get("spark.ariadne.debugInvariants", "false")
        ).lower() != "true":
            return
        dup = (
            df.groupBy(*self.key_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key = {k: dup[0][k] for k in self.key_cols}
            raise ValueError(
                f"segment_unique table {self.path} got an append with "
                f">1 row for key {key}; replace-per-key reads would "
                "silently drop rows — fix the writer or create the "
                "table with segment_unique=False"
            )

    def overwrite(self, df: DataFrame, extra: dict | None = None) -> None:
        seg = self._write_segment(df)
        sch = df.schema.json()
        self._commit(
            lambda old: [{"seq": 1, "dir": seg, "schema": sch}], extra=extra
        )

    def delete_where(self, condition) -> None:
        """Rewrite the table without rows matching ``condition``.

        Index tables are small relative to the lake (per-file summaries),
        so a filtered rewrite is the simple, safe choice — the analog of
        the reference's MERGE whenMatchedDelete."""
        df = self.read()
        if df is None:
            return
        self.overwrite(df.where(~condition))

    def restore(self, version: int) -> None:
        """Roll the table back to ``version`` by committing a NEW
        manifest that references that version's segments — Delta
        RESTORE semantics: history is preserved (the rollback is
        itself a version; the states in between stay readable until
        :meth:`vacuum`), and the operation writes no data, only a
        manifest. Unknown versions raise with the available range;
        restoring past a vacuum may reference reclaimed segments and
        fail at scan time, exactly like an old-version :meth:`read`.

        Reference parity: the reference's storage substrate is Delta
        throughout (FileList.scala:62-67), where ``RESTORE TABLE …
        VERSION AS OF`` is the operational rollback; this is the LSM
        analog, the recovery path after a bad index build or a
        mistaken deleteFiles."""
        vs = self._versions()
        if version not in vs:
            raise ValueError(
                f"version {version} not found for {self.path}; "
                f"available: {vs}"
            )
        m = self._read_manifest(version)
        self._commit(lambda old: m["segments"])

    def compact(self) -> None:
        """Fold all segments into one (OPTIMIZE analog)."""
        m = self._read_manifest()
        if m is None or len(m["segments"]) <= 1:
            return
        df = self.read()
        self.overwrite(df)

    def vacuum(
        self, retention_hours: float | None = None, keep_manifests: int = 3
    ) -> None:
        """Delete segment dirs unreferenced by the latest manifest and
        trim old manifests.

        With ``retention_hours`` set, unreferenced segments and old
        manifests modified within the window are KEPT: a reader that
        pinned an older manifest version is still scanning those
        segment files, and deleting them mid-scan fails the read —
        the same reader-protection contract Delta's VACUUM retention
        gives (reference: Index.scala:761 takes retentionHours and
        forwards it to Delta VACUUM)."""
        import time as _time

        m = self._read_manifest()
        if m is None:
            return
        cutoff = (
            _time.time() - retention_hours * 3600.0
            if retention_hours is not None
            else None
        )

        def _old_enough(p: str) -> bool:
            if cutoff is None:
                return True
            try:
                return self.fs.mtime(p) < cutoff
            except Exception:
                return False  # unknown age: keep (conservative)

        live = {s["dir"].split("/", 1)[1] for s in m["segments"]}
        data_dir = _join(self.path, "data")
        for entry in self.fs.list_names(data_dir):
            p = _join(data_dir, entry)
            if entry not in live and _old_enough(p):
                self.fs.delete(p, recursive=True)
        d = self._manifest_dir()
        for v in self._versions()[:-keep_manifests]:
            p = _join(d, f"v{v:020d}.json")
            if _old_enough(p):
                self.fs.delete(p)

    def drop(self) -> None:
        if self.fs.exists(self.path):
            self.fs.delete(self.path, recursive=True)

    @property
    def num_segments(self) -> int:
        m = self._read_manifest()
        return len(m["segments"]) if m else 0

    def segment_dirs(self) -> list[str]:
        """Absolute paths of the LIVE segment directories (empty when
        the table has never been written). Lets key-only readers scan
        every live segment in one pruned pass with an explicit schema:
        for replace-per-key tables the distinct key set across raw
        segment rows equals the post-dedup key set (dedup only picks
        which ROW wins per key; deletes rewrite segments), so "which
        keys exist" never needs the full replace-per-key read plan."""
        m = self._read_manifest()
        if m is None:
            return []
        return [_join(self.path, s["dir"]) for s in m["segments"]]
