"""Driver-side mirror of Spark's partitioning hash (Murmur3 x86-32,
seed 42) — what lets the atomic table's BUCKET layout prune files for
a point lookup without running a Spark job.

``HashPartitioning`` places a row in partition
``pmod(murmur3(cols, 42), n)``; the algorithm is public (Spark's
``org.apache.spark.unsafe.hash.Murmur3_x86_32`` / the SQL ``hash()``
function, itself standard Murmur3 with Spark's byte-wise tail
handling for strings). The mirror below reproduces it exactly for the
types a table key realistically has — int/long and string — and
REFUSES anything else (None) so callers degrade to "can't prune,
keep the file" instead of risking an unsound skip.
tests/test_bucket_layout.py pins equality against ``F.hash`` and
against real ``repartition(n, key)`` placement.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
SPARK_HASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    x &= _MASK
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 = (h1 ^ k1) & _MASK
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 = (h1 ^ length) & _MASK
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _to_signed32(x: int) -> int:
    x &= _MASK
    return x - (1 << 32) if x >= (1 << 31) else x


def _hash_int(value: int, seed: int) -> int:
    return _fmix(_mix_h1(seed & _MASK, _mix_k1(value & _MASK)), 4)


def _hash_long(value: int, seed: int) -> int:
    v = value & 0xFFFFFFFFFFFFFFFF
    low = v & _MASK
    high = (v >> 32) & _MASK
    h1 = _mix_h1(seed & _MASK, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix(h1, 8)


def _hash_bytes(data: bytes, seed: int) -> int:
    """Spark's hashUnsafeBytes: whole little-endian 4-byte words, then
    each remaining byte mixed individually as a SIGNED byte (not the
    reference murmur3 tail) — byte-for-byte what UTF8String hashing
    does."""
    h1 = seed & _MASK
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        half = b - 256 if b >= 128 else b  # signed byte, sign-extended
        h1 = _mix_h1(h1, _mix_k1(half & _MASK))
    return _fmix(h1, n)


def spark_hash_value(value, dtype: str) -> int | None:
    """Spark SQL ``hash(value)`` (seed 42) as a SIGNED 32-bit int, or
    None when the type isn't mirrored (caller must not prune). dtype
    is the simpleString of the column type."""
    return _spark_hash_step(value, dtype, SPARK_HASH_SEED)


def _spark_hash_step(value, dtype: str, seed: int) -> int | None:
    if value is None:
        return None  # Spark carries the seed through for NULL; callers
        # here only hash concrete predicate literals, so refuse instead
    if dtype in ("int", "integer", "smallint", "short", "tinyint", "byte"):
        if not isinstance(value, int) or isinstance(value, bool):
            return None
        return _to_signed32(_hash_int(value, seed))
    if dtype in ("bigint", "long"):
        if not isinstance(value, int) or isinstance(value, bool):
            return None
        return _to_signed32(_hash_long(value, seed))
    if dtype == "string":
        if not isinstance(value, str):
            return None
        return _to_signed32(_hash_bytes(value.encode("utf-8"), seed))
    return None


def spark_hash_row(values, dtypes) -> int | None:
    """Spark SQL ``hash(c1, c2, ...)``: the seed chains through the
    columns left to right (hash_i seeds hash_{i+1}; initial seed 42) —
    what HashPartitioning computes for a multi-column key. None when
    any column can't be mirrored."""
    h = SPARK_HASH_SEED
    for v, t in zip(values, dtypes):
        h = _spark_hash_step(v, t, h)
        if h is None:
            return None
    return h


def spark_bucket(value, dtype: str, n_buckets: int) -> int | None:
    """The partition ``repartition(n_buckets, col)`` sends a row with
    this single-column key to: pmod(hash, n). None ⇒ can't mirror."""
    return spark_bucket_row([value], [dtype], n_buckets)


def spark_bucket_row(values, dtypes, n_buckets: int) -> int | None:
    h = spark_hash_row(values, dtypes)
    if h is None:
        return None
    return ((h % n_buckets) + n_buckets) % n_buckets
