"""Pure-Python XXH64 with Spark's ``xxhash64`` semantics (seed 42,
per-type byte encodings) — lets the bloom read path hash probe values
driver-side without launching a Spark job per read.

Parity with ``F.xxhash64`` is pinned in tests/test_bloom_skipping.py
(engine side) and tests/test_external_reader.py (the standalone reader
carries its own copy by design — it must not import this package).
Supported encodings: byte/short/int/boolean(0|1)/date(epoch days) as
4-byte LE two's complement, long/timestamp-micros as 8-byte LE, string
as UTF-8. ``spark_xxhash64`` returns None for any other type — callers
fall back to hashing via Spark (exact, just slower).
"""

from __future__ import annotations

import json
from typing import Any, Optional

_M64 = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 over ``data``; unsigned 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            w = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + w * _P2) & _M64, 31) * _P1) & _M64
            w = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + w * _P2) & _M64, 31) * _P1) & _M64
            w = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + w * _P2) & _M64, 31) * _P1) & _M64
            w = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + w * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def spark_xxhash64(value: Any, type_json: str, seed: int = 42) -> Optional[int]:
    """Spark's ``xxhash64(value)`` as the given written type, SIGNED
    64-bit (matching what a Spark collect returns), or None when the
    type's encoding is not implemented here. ``seed`` accepts signed or
    unsigned (masked internally) — Spark's multi-column hash chains
    each column's hash as the next column's seed."""
    import datetime

    stype = json.loads(type_json) if type_json.startswith('"') else type_json
    if not isinstance(stype, str):
        return None
    if stype in ("integer", "short", "byte"):
        data = (int(value) & 0xFFFFFFFF).to_bytes(4, "little")
    elif stype == "long":
        data = (int(value) & _M64).to_bytes(8, "little")
    elif stype == "boolean":
        data = (1 if value else 0).to_bytes(4, "little")
    elif stype == "date":
        days = (
            (value - datetime.date(1970, 1, 1)).days
            if isinstance(value, datetime.date)
            else int(value)
        )
        data = (days & 0xFFFFFFFF).to_bytes(4, "little")
    elif stype == "string":
        data = str(value).encode("utf-8")
    else:
        return None  # float/double/decimal/timestamp: caller uses Spark
    h = xxh64(data, seed & _M64)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_chain(
    values: list, type_jsons: list[str], seed: int = 42
) -> Optional[int]:
    """Spark's ``xxhash64(c1, c2, ...)``: each column's hash seeds the
    next; a NULL column leaves the running hash unchanged (verified
    against Spark empirically and in tests). SIGNED result; None when
    any NON-NULL value's type encoding is unsupported."""
    h = seed
    for v, tj in zip(values, type_jsons):
        if v is None:
            continue  # Spark: NULL input leaves the hash unchanged
        nh = spark_xxhash64(v, tj, seed=h)
        if nh is None:
            return None
        h = nh  # already signed; seed masking handles negatives
    return h
