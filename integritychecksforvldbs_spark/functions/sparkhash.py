"""Pure-Python twin of Spark's ``F.hash()`` (Catalyst Murmur3Hash,
murmur3_x86_32 with seed 42) for the values bucket partitioning
hashes — int/long (and the smaller integrals, which Spark widens to
the int path), string (UTF-8 bytes), date (days-from-epoch int), and
timestamp (micros-from-epoch long).

Why Spark's hash and not Iceberg's bucket spec: the WRITE path must
compute one bucket id per row at 100 TB, and ``F.hash`` is a single
built-in JVM expression inside whole-stage codegen — Iceberg's exact
murmur3 (seed 0, 8-byte little-endian serialization) would need a
hand-built masked-multiply expression chain and still could not
cover strings.  The spec that actually matters is SELF-consistency:
this module is the driver-side twin the pruning translation uses,
pinned bit-for-bit against ``F.hash`` by
tests/test_versioned_bucket.py over every supported type (Spark
cannot change this hash without breaking its own shuffle
partitioning, so the parity is stable).

Reference parity note: the reference schedules by object name hash
buckets nowhere — bucket layout is lakehouse surface (Iceberg's
``bucket(n, col)`` transform re-expressed on this format).
"""

from __future__ import annotations

import datetime

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = ((k1 << 15) | (k1 >> 17)) & _M32
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _M32
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    return h1 ^ (h1 >> 16)


def _signed32(x: int) -> int:
    return x - (1 << 32) if x >= (1 << 31) else x


def hash_int(v: int, seed: int = 42) -> int:
    """Murmur3_x86_32.hashInt — Spark's hash of byte/short/int/date
    columns (a Java ``int``, so the result is signed-32)."""
    return _signed32(_fmix(_mix_h1(seed & _M32, _mix_k1(v & _M32)), 4))


def hash_long(v: int, seed: int = 42) -> int:
    """Murmur3_x86_32.hashLong — Spark's hash of long/timestamp
    columns: the two 32-bit halves of the two's-complement value,
    low first."""
    u = v & _M64
    h1 = _mix_h1(seed & _M32, _mix_k1(u & _M32))
    h1 = _mix_h1(h1, _mix_k1((u >> 32) & _M32))
    return _signed32(_fmix(h1, 8))


def hash_bytes(b: bytes, seed: int = 42) -> int:
    """Murmur3_x86_32.hashUnsafeBytes — Spark's hash of string
    columns over their UTF-8 bytes: little-endian 4-byte words, then
    each tail byte SIGN-EXTENDED and fully mixed on its own (Spark's
    byte-at-a-time tail, not standard murmur3's accumulated tail)."""
    n = len(b)
    aligned = n - n % 4
    h1 = seed & _M32
    for i in range(0, aligned, 4):
        w = int.from_bytes(b[i:i + 4], "little", signed=True)
        h1 = _mix_h1(h1, _mix_k1(w & _M32))
    for i in range(aligned, n):
        x = b[i] - 256 if b[i] >= 128 else b[i]
        h1 = _mix_h1(h1, _mix_k1(x & _M32))
    return _signed32(_fmix(h1, n))


def spark_hash(v, kind: str) -> int:
    """``F.hash(col)`` of one Python value, per the column's hash
    ``kind`` (recorded in the partition-transform spec at parse time
    — the same literal hashes differently as int vs long, so the
    width must come from the SCHEMA, not the value)."""
    if kind == "int":
        return hash_int(int(v))
    if kind == "long":
        return hash_long(int(v))
    if kind == "string":
        return hash_bytes(str(v).encode("utf-8"))
    if kind == "date":
        if isinstance(v, datetime.datetime):
            v = v.date()
        return hash_int((v - _EPOCH_DATE).days)
    if kind == "timestamp":
        if isinstance(v, datetime.date) and not isinstance(
            v, datetime.datetime
        ):
            v = datetime.datetime(v.year, v.month, v.day)
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        delta = v - _EPOCH_DT
        micros = (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )
        return hash_long(micros)
    raise ValueError(f"unsupported hash kind {kind!r}")


def bucket_id(v, kind: str, n: int) -> int:
    """``pmod(hash(v), n)`` — the bucket a value writes to and the
    only dir a point probe on it must scan."""
    h = spark_hash(v, kind)
    return ((h % n) + n) % n
