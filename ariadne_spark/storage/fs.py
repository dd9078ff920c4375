"""Filesystem facade: POSIX fast path + Hadoop ``FileSystem`` via py4j.

The reference performs all storage I/O through Hadoop's ``FileSystem``
abstraction so the same code runs on local disk, HDFS, S3A and ABFS
(reference: src/main/scala/dev/cjfravel/ariadne/IndexMetadataOperations.scala:125-155,
IndexLock.scala:396-411, file sizes Index.scala:861-908). This module
gives the Python engine the same reach:

* ``PosixFS`` — plain ``os`` calls for local paths (and ``file:`` URIs).
  ``O_CREAT|O_EXCL`` gives a genuinely atomic create-exclusive.
* ``HadoopFS`` — driver-side py4j calls into
  ``org.apache.hadoop.fs.FileSystem`` for any URI Spark itself can
  reach (``hdfs:``, ``s3a:``, ``abfs:``, ``file:``). Create-exclusive
  maps to ``FileSystem.create(path, overwrite=false)`` — atomic on
  HDFS/ABFS; on S3A it is check-then-write, the identical hazard the
  reference accepts for its lock files.

Only the driver touches this module: executors exchange data through
Spark reads/writes, never through the facade (py4j does not exist in
Python workers).

``get_fs(spark, path)`` picks the backend by scheme; set
``spark.ariadne.forceHadoopFS=true`` to route local paths through the
Hadoop API (used by tests to exercise the py4j backend without a real
object store).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid


def strip_file_scheme(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):] or "/"
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


def scheme_of(path: str) -> str | None:
    if "://" in path:
        return path.split("://", 1)[0]
    if path.startswith("file:"):
        return "file"
    return None


def join(*parts: str) -> str:
    """Scheme-preserving path join (URIs and POSIX paths alike)."""
    out = parts[0].rstrip("/")
    for p in parts[1:]:
        out += "/" + p.strip("/")
    return out


class PosixFS:
    """Local-filesystem backend (the default and test fast path)."""

    def _p(self, path: str) -> str:
        return strip_file_scheme(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(self._p(path))

    def mkdirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def list_names(self, path: str) -> list[str]:
        p = self._p(path)
        if not os.path.isdir(p):
            return []
        return sorted(os.listdir(p))

    def list_files(self, path: str, suffix: str = "") -> list[str]:
        return [
            join(path, n)
            for n in self.list_names(path)
            if n.endswith(suffix)
        ]

    def read_text(self, path: str) -> str | None:
        try:
            with open(self._p(path)) as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def create_exclusive(self, path: str, text: str) -> bool:
        """Atomically create ``path`` with ``text``; False if it exists."""
        p = self._p(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as fh:
            fh.write(text)
        return True

    def write_atomic(self, path: str, text: str) -> None:
        p = self._p(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p), suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                fh.write(text)
            os.replace(tmp, p)
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass

    def delete(self, path: str, recursive: bool = False) -> bool:
        p = self._p(path)
        try:
            if recursive and os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                return True
            os.remove(p)
            return True
        except FileNotFoundError:
            return False
        except IsADirectoryError:
            os.rmdir(p)
            return True

    def size(self, path: str) -> int | None:
        try:
            return os.path.getsize(self._p(path))
        except OSError:
            return None

    def mtime(self, path: str) -> float:
        try:
            return os.path.getmtime(self._p(path))
        except OSError:
            return 0.0

    def sizes(self, paths: list[str]) -> list[int]:
        return [self.size(p) or 0 for p in paths]

    def rename(self, src: str, dst: str) -> bool:
        """Move a file or directory (no-clobber for directories on
        POSIX: rename onto an existing non-empty dir fails)."""
        try:
            os.rename(self._p(src), self._p(dst))
            return True
        except OSError:
            return False

    def supports_atomic_create(self, path: str) -> bool:
        """POSIX ``O_CREAT|O_EXCL`` is genuinely atomic."""
        return True


# schemes whose rename-without-overwrite (the claim primitive in
# HadoopFS.create_exclusive) is atomic by the store's own contract
_ATOMIC_RENAME_SCHEMES = {"file", "hdfs", "viewfs", "abfs", "abfss", "o3fs", "ofs"}

# PathCapabilities keys that indicate the store can do a conditional
# (If-None-Match) create — S3A grew this in recent Hadoop releases;
# probe a few spellings since the constant moved while stabilizing
_CONDITIONAL_CREATE_CAPS = (
    "fs.capability.conditional.create",
    "fs.s3a.capability.conditional.create",
    "fs.capability.create.conditional",
)


class HadoopFS:
    """Hadoop ``FileSystem`` backend (driver-side py4j).

    One instance binds to the filesystem of the URI it is constructed
    with (Hadoop caches the underlying FS object per scheme+authority).
    """

    def __init__(self, spark, path: str) -> None:
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._jpath = self._jvm.org.apache.hadoop.fs.Path
        self._conf = spark._jsc.hadoopConfiguration()
        uri = self._jvm.java.net.URI(path)
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(uri, self._conf)
        self._uri = uri

    def _p(self, path: str):
        return self._jpath(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(
            self._fs.getFileStatus(p).isDirectory()
        )

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def _list_status(self, path: str):
        if not self.exists(path):
            return []
        return list(self._fs.listStatus(self._p(path)))

    def list_names(self, path: str) -> list[str]:
        return sorted(st.getPath().getName() for st in self._list_status(path))

    def list_files(self, path: str, suffix: str = "") -> list[str]:
        return sorted(
            st.getPath().toString()
            for st in self._list_status(path)
            if st.getPath().getName().endswith(suffix)
        )

    def read_text(self, path: str) -> str | None:
        if not self.exists(path):
            return None
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def _scheme(self) -> str:
        return (self._uri.getScheme() or "file").lower()

    def _has_conditional_create(self, path: str) -> bool:
        for cap in _CONDITIONAL_CREATE_CAPS:
            try:
                if bool(self._fs.hasPathCapability(self._p(path), cap)):
                    return True
            except Exception:
                continue
        return False

    def supports_atomic_create(self, path: str) -> bool:
        """Whether :meth:`create_exclusive` is a true atomic claim on
        this store: yes for atomic-rename filesystems (HDFS/ABFS/...)
        and for object stores advertising conditional (If-None-Match)
        create; no for raw S3-style check-then-write."""
        if self._scheme() in _ATOMIC_RENAME_SCHEMES:
            return True
        return self._has_conditional_create(path)

    def create_exclusive(self, path: str, text: str) -> bool:
        """Atomic create-with-content: the FULL text is written to a
        temp file first, then claimed via no-clobber rename. Claiming
        at ``create()`` time and writing afterwards would leave a
        committed EMPTY file (e.g. a manifest version) if the write
        failed mid-way — wedging every subsequent reader on that
        version. rename-without-overwrite is atomic on HDFS/ABFS and
        returns false when the destination exists.

        Object stores with conditional-create support take a different
        path: a direct ``create(overwrite=false)`` + write + close.
        There the store publishes nothing until close() (no partial
        files to leak) and the If-None-Match commit makes the claim
        atomic — while their RENAME is copy-then-delete and would
        race. Stores with neither capability fall through to the
        rename path and remain check-then-write (callers can probe
        :meth:`supports_atomic_create` and warn)."""
        parent = path.rsplit("/", 1)[0]
        self.mkdirs(parent)
        if (
            self._scheme() not in _ATOMIC_RENAME_SCHEMES
            and self._has_conditional_create(path)
        ):
            try:
                out = self._fs.create(self._p(path), False)
                try:
                    out.write(bytearray(text.encode("utf-8")))
                finally:
                    out.close()
                return True
            except Exception as e:  # conditional-commit loss = exists
                msg = f"{type(e).__name__}: {e}"
                if (
                    "AlreadyExists" in msg
                    or "PreconditionFailed" in msg
                    or "412" in msg
                ):
                    return False
                raise
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        if self._fs.rename(self._p(tmp), self._p(path)):
            return True
        self._fs.delete(self._p(tmp), False)
        return False

    def write_atomic(self, path: str, text: str) -> None:
        """Overwriting atomic write. Must NOT go delete-then-rename:
        a reader (or lock poller) in that window would see the path
        missing — for IndexLock.refresh() that window let a second
        writer acquire a held lock. FileContext.rename with
        Options.Rename.OVERWRITE is the atomic-replace primitive."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._uri, self._conf
            )
            overwrite = self._jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
            opts = self._gateway.new_array(
                self._jvm.org.apache.hadoop.fs.Options.Rename, 1
            )
            opts[0] = overwrite
            fc.rename(self._p(tmp), self._p(path), opts)
        except Exception:
            # No FileContext for this scheme (some object-store
            # connectors): fall back to plain rename, then two-step
            # replace. The not-exists window is the connector's
            # documented non-atomic-rename hazard, not ours to fix.
            if not self._fs.rename(self._p(tmp), self._p(path)):
                self._fs.delete(self._p(path), False)
                if not self._fs.rename(self._p(tmp), self._p(path)):
                    self._fs.delete(self._p(tmp), False)
                    raise OSError(f"rename {tmp} -> {path} failed")

    def delete(self, path: str, recursive: bool = False) -> bool:
        return bool(self._fs.delete(self._p(path), recursive))

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self._p(src), self._p(dst)))

    def size(self, path: str) -> int | None:
        if not self.exists(path):
            return None
        return int(self._fs.getFileStatus(self._p(path)).getLen())

    def mtime(self, path: str) -> float:
        if not self.exists(path):
            return 0.0
        return self._fs.getFileStatus(self._p(path)).getModificationTime() / 1000.0

    def sizes(self, paths: list[str]) -> list[int]:
        """Batch file sizes: one ``listStatus`` per parent directory
        instead of one RPC per file (object-store list calls are ~1000×
        cheaper per entry than per-file HEADs)."""
        by_parent: dict[str, list[str]] = {}
        for p in paths:
            by_parent.setdefault(p.rsplit("/", 1)[0], []).append(p)
        out: dict[str, int] = {}
        for parent, members in by_parent.items():
            listed = {
                st.getPath().getName(): int(st.getLen())
                for st in self._list_status(parent)
                if st.isFile()
            }
            for m in members:
                out[m] = listed.get(m.rsplit("/", 1)[1], 0)
        return [out[p] for p in paths]


def get_fs(spark, path: str):
    """Backend for ``path``: POSIX for local paths (fast, truly atomic
    O_EXCL), Hadoop for remote URIs. ``spark.ariadne.forceHadoopFS``
    routes even local paths through py4j (test hook)."""
    force = "false"
    if spark is not None:
        try:
            force = spark.conf.get("spark.ariadne.forceHadoopFS", "false")
        except Exception:
            force = "false"
    sch = scheme_of(path)
    if (sch is None or sch == "file") and force.lower() != "true":
        return PosixFS()
    if spark is None:
        raise ValueError(f"remote path {path!r} needs an active SparkSession")
    return HadoopFS(spark, path)


def _fs_key(path: str) -> str | None:
    """Backend identity for grouping: scheme + authority. A HadoopFS
    instance binds to ONE filesystem (Hadoop checkPath rejects paths
    from another bucket/namenode with 'Wrong FS'), so s3a://bucket-a
    and s3a://bucket-b need separate instances despite equal schemes."""
    if "://" in path:
        scheme, rest = path.split("://", 1)
        return f"{scheme}://{rest.split('/', 1)[0]}"
    if path.startswith("file:"):
        return "file"
    return None


def batch_sizes(spark, paths: list[str]) -> list[int]:
    """File sizes for a mixed list of paths, grouped per backend."""
    if not paths:
        return []
    groups: dict[str | None, list[int]] = {}
    for i, p in enumerate(paths):
        groups.setdefault(_fs_key(p), []).append(i)
    out = [0] * len(paths)
    for _sch, idxs in groups.items():
        fs = get_fs(spark, paths[idxs[0]])
        for i, size in zip(idxs, fs.sizes([paths[j] for j in idxs])):
            out[i] = size
    return out


def read_json(fs, path: str) -> dict | None:
    raw = fs.read_text(path)
    return None if raw is None else json.loads(raw)
