"""Pure-Python bloom filters over string-ized values.

The reference serializes Guava ``BloomFilter[CharSequence]`` binaries
into a BinaryType index column and probes string representations of
values (reference:
src/main/scala/dev/cjfravel/ariadne/BloomFilterOperations.scala:95-173,
probe :225-287; string-typed membership documented in SURVEY §1.3).
The wire format is internal to the index, so this implementation uses
its own deterministic format (no Guava compatibility needed —
BloomFilterOperations.scala:26-28 documents the bytes as an
implementation detail):

    b"ABF1" | uint64 m_bits | uint32 k | bit array (little-endian packed)

Hashing is Kirsch–Mitzenmacher double hashing over the two 64-bit
halves of ``sha256(utf8(value))`` — deterministic across Python
versions and processes (unlike ``hash()``).
"""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np

_MAGIC = b"ABF1"
_HEADER = struct.Struct("<4sQI")

_MIN_BITS = 64


def _params(n: int, fpr: float) -> tuple[int, int]:
    """Optimal (m_bits, k) for n insertions at target fpr."""
    n = max(n, 1)
    m = max(_MIN_BITS, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, min(k, 32)


def _hash_pair(value) -> tuple[int, int]:
    d = hashlib.sha256(str(value).encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:16], "little") | 1  # odd => full period mod 2^x
    return h1, h2


def build(values, fpr: float = 0.01) -> bytes | None:
    """Serialize a bloom filter containing ``values`` (None-safe)."""
    if values is None:
        return None
    vals = [v for v in values if v is not None]
    m, k = _params(len(vals), fpr)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    for v in vals:
        h1, h2 = _hash_pair(v)
        idx = (h1 + np.arange(k, dtype=np.uint64) * np.uint64(h2)) % np.uint64(m)
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return _HEADER.pack(_MAGIC, m, k) + bits.tobytes()


def _parse(blob: bytes) -> tuple[int, int, np.ndarray]:
    magic, m, k = _HEADER.unpack_from(blob)
    if magic != _MAGIC:
        raise ValueError("not an ariadne bloom filter")
    bits = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size)
    return m, k, bits


def might_contain(blob: bytes | None, value) -> bool:
    """Single probe. None blob (no filter built) => must read the file."""
    if blob is None:
        return True
    m, k, bits = _parse(blob)
    h1, h2 = _hash_pair(value)
    idx = (h1 + np.arange(k, dtype=np.uint64) * np.uint64(h2)) % np.uint64(m)
    byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
    return bool(np.all(byte & (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))))


def might_contain_any(blob: bytes | None, hash_pairs) -> bool:
    """Probe many pre-hashed values against one filter; True if any
    value may be present. Accepts a list of (h1, h2) tuples or an
    (n, 2) uint64 ndarray (the scale path — see ``hash_values_np``)."""
    if blob is None:
        return True
    pairs = np.asarray(hash_pairs, dtype=np.uint64).reshape(-1, 2)
    for start in range(0, len(pairs), 65536):
        if might_contain_np(blob, pairs[start : start + 65536]).any():
            return True
    return False


def might_contain_np(blob: bytes | None, pairs: np.ndarray) -> np.ndarray:
    """Vectorized membership for an (n, 2) uint64 hash-pair array
    against one filter: returns a boolean array (True = maybe
    present). Chunked so the (chunk × k) index matrix stays small;
    uint64 arithmetic wraps mod 2^64 exactly like ``might_contain``."""
    if blob is None:
        return np.ones(len(pairs), dtype=bool)
    m, k, bits = _parse(blob)
    ks = np.arange(k, dtype=np.uint64)
    m64 = np.uint64(m)
    out = np.empty(len(pairs), dtype=bool)
    for start in range(0, len(pairs), 65536):
        chunk = pairs[start : start + 65536]
        idx = (chunk[:, 0:1] + ks[None, :] * chunk[:, 1:2]) % m64
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        out[start : start + 65536] = np.all(
            byte & (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)), axis=1
        )
    return out


def hash_values(values) -> list[tuple[int, int]]:
    return [_hash_pair(v) for v in values if v is not None]


def hash_values_np(values) -> np.ndarray:
    """(n, 2) uint64 hash-pair array for driver-side value lists."""
    pairs = hash_values(values)
    return np.asarray(pairs, dtype=np.uint64).reshape(-1, 2)


def digest16(value) -> bytes:
    """First 16 bytes of sha256(str(value)) — the wire form of a hash
    pair (little-endian h1 ‖ h2-before-odd-or). Computed executor-side
    so the driver only ever collects 16 B per distinct query value,
    never the values themselves."""
    return hashlib.sha256(str(value).encode("utf-8")).digest()[:16]


def pairs_from_digests(digests) -> np.ndarray:
    """Decode collected 16-byte digests into an (n, 2) uint64 pair
    array, applying the same h2 |= 1 full-period adjustment as
    ``_hash_pair``."""
    buf = b"".join(bytes(d) for d in digests)
    arr = np.frombuffer(buf, dtype="<u8").reshape(-1, 2).copy()
    arr[:, 1] |= np.uint64(1)
    return arr
