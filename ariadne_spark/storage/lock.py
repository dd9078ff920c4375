"""File-based advisory locks for index writers.

Same protocol as the reference (reference:
src/main/scala/dev/cjfravel/ariadne/IndexLock.scala:29,99-246,396-411):
a JSON lock file created atomically (O_CREAT|O_EXCL locally, Hadoop
``create(overwrite=false)`` on remote stores — storage/fs.py); stale locks
(lastRefreshedAt older than lockTimeout) are healed by deleting and
retrying; acquisition backs off exponentially up to lockMaxWait;
holders may refresh a heartbeat during long operations.
"""

from __future__ import annotations

import json
import logging
import os
import time
import uuid

from ..exceptions import LockAcquisitionError, LockNotHeldError
from .fs import PosixFS, join as _join

log = logging.getLogger("ariadne")

# lock paths already warned about (once per path per process — the
# warning must be loud, not a per-retry flood)
_WARNED_NON_ATOMIC: set = set()


class IndexLock:
    def __init__(
        self,
        lock_dir: str,
        name: str = "update",
        timeout: float = 1800.0,
        retry_interval: float = 60.0,
        max_wait: float = 3600.0,
        fs=None,
    ) -> None:
        self.path = _join(lock_dir, f"{name}.lock")
        self.fs = fs if fs is not None else PosixFS()
        self.timeout = timeout
        self.retry_interval = retry_interval
        self.max_wait = max_wait
        self.correlation_id: str | None = None

    # ------------------------------------------------------------------

    def _read(self) -> dict | None:
        try:
            raw = self.fs.read_text(self.path)
            if raw is None:
                return None
            return json.loads(raw)
        except (json.JSONDecodeError, OSError):
            # corrupt lock file: treat as stale immediately
            return {"lastRefreshedAt": 0.0, "corrupt": True}

    def _try_create(self, doc: dict) -> bool:
        return self.fs.create_exclusive(self.path, json.dumps(doc))

    def acquire(self) -> str:
        # Never silently advisory: if this store cannot do an atomic
        # create-exclusive (raw S3 without conditional writes), say so
        # loudly at acquire time — two writers could both "win".
        # (Conditional-create-capable S3 and all atomic-rename stores
        # probe True and stay quiet; reference accepts the same hazard
        # silently, IndexLock.scala:396-411.)
        probe = getattr(self.fs, "supports_atomic_create", None)
        if probe is not None and self.path not in _WARNED_NON_ATOMIC:
            try:
                atomic = bool(probe(self.path))
            except Exception:
                atomic = True  # probe failure is not evidence of a race
            if not atomic:
                _WARNED_NON_ATOMIC.add(self.path)
                log.warning(
                    "lock %s lives on a store WITHOUT atomic "
                    "create-exclusive: acquisition is check-then-write "
                    "and concurrent writers may both acquire. Use "
                    "HDFS/ABFS, S3 with conditional-write support "
                    "(recent Hadoop S3A), or an external lock service "
                    "for multi-writer safety.",
                    self.path,
                )
        corr = uuid.uuid4().hex
        start = time.monotonic()
        wait = min(1.0, self.retry_interval)
        while True:
            now = time.time()
            doc = {
                "correlationId": corr,
                "acquiredAt": now,
                "lastRefreshedAt": now,
                "owner": f"pid-{os.getpid()}",
            }
            if self._try_create(doc):
                self.correlation_id = corr
                return corr
            existing = self._read()
            if existing is not None and (
                time.time() - float(existing.get("lastRefreshedAt", 0.0))
                > self.timeout
            ):
                # stale-heal: delete and retry immediately
                self.fs.delete(self.path)
                continue
            if time.monotonic() - start > self.max_wait:
                raise LockAcquisitionError(self.path)
            time.sleep(wait)
            wait = min(wait * 2, 60.0, self.retry_interval)

    def refresh(self) -> None:
        if self.correlation_id is None:
            raise LockNotHeldError(self.path)
        doc = self._read()
        if doc is None or doc.get("correlationId") != self.correlation_id:
            raise LockNotHeldError(self.path)
        doc["lastRefreshedAt"] = time.time()
        self.fs.write_atomic(self.path, json.dumps(doc))

    def release(self) -> None:
        if self.correlation_id is None:
            return
        doc = self._read()
        if doc is not None and doc.get("correlationId") == self.correlation_id:
            self.fs.delete(self.path)
        self.correlation_id = None

    def heartbeat(self) -> "_Heartbeat":
        """Background refresher so a long-running holder never goes
        stale mid-operation (the reference runs the same thread during
        long builds/migrations, IndexBuildOperations.scala:328-373)."""
        return _Heartbeat(self)

    def __enter__(self) -> "IndexLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()


class _Heartbeat:
    def __init__(self, lock: IndexLock, interval: float | None = None):
        import threading

        self.lock = lock
        self.interval = interval if interval is not None else max(lock.timeout / 3, 0.05)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            try:
                self.lock.refresh()
            except LockNotHeldError:
                return  # released/lost: stop beating, holder will notice

    def __enter__(self) -> "_Heartbeat":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
