"""Standalone reader for the VersionedParquetTable on-disk format.

Implements `docs/commit-format.md` from scratch against pyarrow ONLY — no
imports from ``odbc2deltalake_spark`` — to prove the commit-log contract
is implementable by a third party. This is the analogue of the
reference's external duckdb oracle over its Delta output
(reference:tests/test_03_delta.py:101-112): if this reader and the
engine's own ``VersionedParquetTable.read`` ever disagree, either the
spec or the writer is wrong (tests/test_external_reader.py pins them to
each other across write -> evolve -> merge -> rebucket -> restore ->
vacuum).

Usage:
    from tools.external_reader import read_table, snapshot
    tbl = read_table("/path/to/table")            # latest, pyarrow.Table
    tbl = read_table("/path/to/table", version=3) # time travel
    st  = snapshot("/path/to/table")              # live dirs/schema/props
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Optional

import pyarrow as pa
import pyarrow.dataset as ds

# protocol version this reader implements (spec `min_reader_version`)
READER_VERSION = 1

_PRIMITIVES = {
    "byte": pa.int8(),
    "short": pa.int16(),
    "integer": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "boolean": pa.bool_(),
    "binary": pa.binary(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us", tz="UTC"),
    "timestamp_ntz": pa.timestamp("us"),
}
_DECIMAL_RE = re.compile(r"decimal\((\d+),\s*(-?\d+)\)")


def _arrow_type(t: Any) -> pa.DataType:
    """Spark StructType-JSON type node -> arrow type."""
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        m = _DECIMAL_RE.fullmatch(t)
        if m:
            return pa.decimal128(int(m.group(1)), int(m.group(2)))
        raise ValueError(f"unsupported Spark type: {t}")
    kind = t["type"]
    if kind == "array":
        return pa.list_(_arrow_type(t["elementType"]))
    if kind == "map":
        return pa.map_(_arrow_type(t["keyType"]), _arrow_type(t["valueType"]))
    if kind == "struct":
        return pa.struct(
            [pa.field(f["name"], _arrow_type(f["type"])) for f in t["fields"]]
        )
    raise ValueError(f"unsupported Spark type: {t!r}")


def _arrow_schema(spark_schema_json: str) -> pa.Schema:
    spec = json.loads(spark_schema_json)
    return pa.schema(
        [pa.field(f["name"], _arrow_type(f["type"])) for f in spec["fields"]]
    )


# ---------- XXH64 (bloom-bitmap probes, Spark xxhash64 parity) ----------
# Standard XXH64 (public algorithm) — Spark's `xxhash64` is XXH64 with
# seed 42 over a per-type byte encoding, so an independent reader can
# probe the spec's bloom bitmaps without any Spark dependency. Parity
# with the engine is pinned in tests/test_external_reader.py.

_M64 = (1 << 64) - 1
_XP1 = 11400714785074694791
_XP2 = 14029467366897019727
_XP3 = 1609587929392839161
_XP4 = 9650029242287828579
_XP5 = 2870177450012600261


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XP1) & _M64
        while i + 32 <= n:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                w = int.from_bytes(data[i + off : i + off + 8], "little")
                if v == 1:
                    v1 = (_rotl64((v1 + w * _XP2) & _M64, 31) * _XP1) & _M64
                elif v == 2:
                    v2 = (_rotl64((v2 + w * _XP2) & _M64, 31) * _XP1) & _M64
                elif v == 3:
                    v3 = (_rotl64((v3 + w * _XP2) & _M64, 31) * _XP1) & _M64
                else:
                    v4 = (_rotl64((v4 + w * _XP2) & _M64, 31) * _XP1) & _M64
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XP2) & _M64, 31) * _XP1) & _M64
            h = (h * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((k * _XP2) & _M64, 31) * _XP1) & _M64
        h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XP1) & _M64
        h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_rotl64(h, 11) * _XP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h


def _spark_xxhash64(value: Any, type_json: str) -> Optional[int]:
    """Spark's ``xxhash64(value)`` as the recorded written type, as a
    SIGNED 64-bit int (the spec's `h`), or None when this reader does
    not implement the type's encoding (caller must then skip the bloom
    — pure-optimization contract keeps results exact)."""
    import datetime

    stype = json.loads(type_json) if type_json.startswith('"') else type_json
    if not isinstance(stype, str):
        return None  # nested types: not bloom-probed
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
        return None  # float/double/decimal/timestamp: skip, stay exact
    h = _xxh64(data, 42)
    return h - (1 << 64) if h >= (1 << 63) else h


def _bloom_may_contain(b64: str, m: int, k: int, h: int) -> bool:
    """False ONLY when the bitmap proves the value absent (spec probe
    positions: ``(h mod m + i * ((h >> 33) | 1)) mod m``, signed h)."""
    import base64

    bits = base64.b64decode(b64)
    h1 = h % m
    h2 = (h >> 33) | 1
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (bits[pos // 8] >> (pos % 8)) & 1:
            return False
    return True


def version_at_timestamp(root: str | Path, ts) -> int:
    """Newest version whose (monotonized) commit `ts` is <= ``ts`` —
    the spec's timestamp→version resolution (Delta ``timestampAsOf``).
    ``ts`` is epoch seconds or a datetime. Commits without a `ts` field
    count as time 0; writer-clock regressions are monotonized with a
    running max so a later version never resolves as earlier."""
    import datetime as _dt

    if isinstance(ts, _dt.datetime):
        ts = ts.timestamp()
    commits_dir = Path(root) / "_commits"
    names = sorted(
        p.name
        for p in commits_dir.iterdir()
        if p.name.endswith(".json") and not p.name.startswith(".")
    )
    best = None
    running = 0.0
    for name in names:
        c = json.loads((commits_dir / name).read_text())
        running = max(running, float(c.get("ts") or 0.0))
        if running <= ts:
            best = int(name.split(".")[0])
        else:
            break
    if best is None:
        raise ValueError(f"timestamp {ts} predates the first commit of {root}")
    return best


def snapshot(root: str | Path, version: Optional[int] = None) -> dict[str, Any]:
    """Replay `_commits/` up to ``version`` per the spec's reader
    algorithm; returns {version, entries, schema, props}."""
    commits_dir = Path(root) / "_commits"
    names = sorted(
        p.name
        for p in commits_dir.iterdir()
        if p.name.endswith(".json") and not p.name.startswith(".")
    )
    if not names:
        raise FileNotFoundError(f"no commits under {commits_dir}")
    live: list[dict[str, Any]] = []
    patches: list[dict[str, Any]] = []
    masks: list[dict[str, Any]] = []
    schema_json: Optional[str] = None
    bucket_cols: Optional[list[str]] = None
    props: dict[str, str] = {}
    last = -1
    for name in names:
        v = int(name.split(".")[0])
        if version is not None and v > version:
            break
        c = json.loads((commits_dir / name).read_text())
        if int(c.get("min_reader_version") or 1) > READER_VERSION:
            # protocol fence (spec): a commit demanding a newer reader
            # makes the whole table-from-here unreadable, not skippable
            raise RuntimeError(
                f"{root} version {v} requires reader version "
                f"{c.get('min_reader_version')} (this reader: "
                f"{READER_VERSION})"
            )
        last = v
        mode = c["mode"]
        if mode == "overwrite":
            live = []
            patches = []
            masks = []
        if mode == "restore":
            live = list(c["dirs"])
            patches = list(c.get("patches") or [])
            masks = list(c.get("masks") or [])
        elif mode == "merge":
            replaced = set(c.get("buckets_replaced") or [])
            live = [e for e in live if e.get("bucket") not in replaced]
            live.extend(c.get("dirs_added") or [])
            patches = []  # every merge writer folds the patch chain
        elif mode == "patch":
            patches.append(
                {
                    "dir": c["dir"],
                    "schema": c["written_schema"],
                    "version": v,
                }
            )
        elif mode == "mask":
            masks.append(
                {
                    "predicate": c["predicate"],
                    "dirs": [e["dir"] for e in c["dirs_masked"]],
                    "version": v,
                    "set_exprs": c.get("set_exprs"),
                }
            )
        elif c.get("dirs_added"):
            live.extend(c["dirs_added"])
        elif c.get("dir"):
            entry: dict[str, Any] = {"dir": c["dir"], "schema": c["schema"]}
            if c.get("stats"):
                entry["stats"] = c["stats"]
            if c.get("bloom"):
                entry["bloom"] = c["bloom"]
            if c.get("partition_by"):
                entry["partitioned"] = True
            live.append(entry)
        if c.get("schema"):
            schema_json = c["schema"]
        if c.get("bucket_cols"):
            bucket_cols = c["bucket_cols"]
        props.update(c.get("set_props") or {})
    if version is not None and last < version:
        raise ValueError(f"version {version} does not exist under {root}")
    if masks:
        # a mask survives only for the dirs still live (rewrites retire
        # masked dirs; uuid-unique names never come back except via
        # restore, which resets masks wholesale)
        live_names = {e["dir"] for e in live}
        masks = [
            m2
            for m2 in (
                {**m, "dirs": [x for x in m["dirs"] if x in live_names]}
                for m in masks
            )
            if m2["dirs"]
        ]
    return {
        "version": last,
        "entries": live,
        "schema": schema_json,
        "props": props,
        "patches": patches,
        "masks": masks,
        "bucket_cols": bucket_cols,
    }


def _scan_entry(root: Path, entry: dict[str, Any], target: pa.Schema) -> pa.Table:
    """One live-dir scan projected to the table schema: hive partition
    dirs are resolved, columns missing from the files read as NULL, and
    present columns cast to the target type (the spec permits only
    lossless widenings)."""
    written = _arrow_schema(entry["schema"])
    if entry.get("__files"):
        dset = ds.dataset(
            [str(root / entry["dir"] / f) for f in entry["__files"]],
            format="parquet",
        )
    else:
        dset = ds.dataset(
            str(root / entry["dir"]), format="parquet", partitioning="hive"
        )
    have = set(dset.schema.names)
    t = dset.to_table(columns=[n for n in written.names if n in have])
    n = t.num_rows
    cols = []
    for field in target:
        if field.name in have:
            cols.append(t.column(field.name).cast(field.type))
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=target)


def _stat_deser(v: Any) -> Any:
    import datetime
    import decimal

    if isinstance(v, (list, tuple)):  # `in`-list values, element-wise
        return [_stat_deser(e) for e in v]
    if isinstance(v, dict):
        if v.get("t") == "ts":
            return datetime.datetime.fromisoformat(v["v"])
        if v.get("t") == "date":
            return datetime.date.fromisoformat(v["v"])
        if v.get("t") == "dec":
            return decimal.Decimal(v["v"])
    return v


def _may_match(mn: Any, mx: Any, op: str, value: Any) -> bool:
    if mn is None or mx is None:
        return True
    try:
        if op == "!=":
            return not (mn == value == mx)
        if op == "in":
            return any(mn <= v <= mx for v in value if v is not None)
        return {
            ">": mx > value,
            ">=": mx >= value,
            "<": mn < value,
            "<=": mn <= value,
            "=": mn <= value <= mx,
        }[op]
    except TypeError:
        return True


def _pc_compare(arr, op: str, value: Any):
    """One (column, op, value) comparison as a pyarrow boolean array —
    SQL three-valued semantics (NULL column values yield NULL, never
    TRUE), matching the engine's ``_op_column``."""
    import pyarrow.compute as pc

    if op == "in":
        vals = [v for v in value if v is not None]
        if not vals:  # IN () / IN (NULL…): matches nothing
            return pa.nulls(len(arr), pa.bool_())
        res = pc.is_in(arr, value_set=pa.array(vals))
        # arrow's is_in returns false for NULL inputs; SQL says NULL
        return pc.if_else(
            pc.is_null(arr), pa.scalar(None, pa.bool_()), res
        )
    fn = {
        ">": pc.greater,
        ">=": pc.greater_equal,
        "<": pc.less,
        "<=": pc.less_equal,
        "=": pc.equal,
        "!=": pc.not_equal,
    }[op]
    return fn(arr, pa.scalar(value))


def _conjuncts(skip_where) -> list[tuple[str, str, Any]]:
    """Normalize ``skip_where``: None / one (col, op, value) tuple / a
    list of tuples (implicit AND) — the same forms the engine's
    ``read()`` accepts (docs/commit-format.md reader algorithm)."""
    if skip_where is None or len(skip_where) == 0:
        return []
    if isinstance(skip_where[0], str):
        return [tuple(skip_where)]
    return [tuple(c) for c in skip_where]


def read_table(
    root: str | Path,
    version: Optional[int] = None,
    skip_where: Optional[tuple[str, str, Any] | list[tuple[str, str, Any]]] = None,
    timestamp=None,
) -> pa.Table:
    """Materialize a snapshot as one pyarrow Table (row order unspecified).

    ``timestamp`` (epoch seconds or datetime, exclusive with
    ``version``) reads the newest version committed at or before that
    time via :func:`version_at_timestamp`.

    ``skip_where=(col, op, value)`` — or a LIST of such tuples (AND of
    all of them) — applies the spec's data-skipping rules: entries/files
    whose recorded [min, max] provably cannot match every conjunct are
    never opened; the predicates are then applied to surviving rows so
    the result equals an unpruned filter. Conjunctive pruning intersects
    the per-conjunct survivor sets — on Z-ordered commits each extra
    clustered column multiplies the cut, exactly as in the engine."""
    root = Path(root)
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at_timestamp(root, timestamp)
    st = snapshot(root, version)
    target = _arrow_schema(st["schema"])
    entries = st["entries"]
    conj = _conjuncts(skip_where)
    if conj:
        # an UPDATE mask rewrites values at read time: recorded [min,
        # max] for its SET columns no longer bound what the scan RETURNS
        # — pruning must ignore stats on those columns for the masked
        # dirs (same rule as the engine; tombstone masks only remove
        # rows, their stats stay valid upper bounds)
        upd_unstat: dict[str, set] = {}
        for m in st.get("masks") or []:
            if m.get("set_exprs"):
                for name in m["dirs"]:
                    upd_unstat.setdefault(name, set()).update(m["set_exprs"])
        kept = []
        for e in entries:
            stats = e.get("stats") or {}
            files_all = {f for f in stats if f != ""}
            drop = False
            keep: Optional[set] = None  # None => all files kept
            unstat = upd_unstat.get(e["dir"], ())
            bloom = e.get("bloom") or {}
            for scol, sop, sval in conj:
                if scol in unstat:
                    continue  # update-masked column: stats/bloom invalid
                if sop in ("=", "in") and scol in (bloom.get("types") or {}):
                    pvals = [sval] if sop == "=" else list(sval)
                    pvals = [v for v in pvals if v is not None]
                    if not pvals:
                        drop = True  # `= NULL` / empty IN: matches nothing
                        break
                    hs = [
                        _spark_xxhash64(v, bloom["types"][scol])
                        for v in pvals
                    ]
                    bfiles = bloom.get("files")
                    if bfiles is None and bloom.get("ref"):
                        # sidecar bitmaps (large blooms live in
                        # `<dir>/_bloom.json`, not inline commit JSON);
                        # unreadable -> skip the bloom, stay exact
                        try:
                            bfiles = json.loads(
                                (root / bloom["ref"]).read_text()
                            )["files"]
                        except Exception:  # noqa: BLE001
                            bfiles = None
                    if bfiles is not None and all(
                        h is not None for h in hs
                    ):
                        # spec: a file absent from the map (or lacking
                        # this column's bitmap) provably holds no
                        # non-null value of the column
                        kb = {
                            f
                            for f, per in bfiles.items()
                            if scol in per
                            and any(
                                _bloom_may_contain(
                                    per[scol], bloom["m"], bloom["k"], h
                                )
                                for h in hs
                            )
                        }
                        if not kb:
                            drop = True
                            break
                        if not e.get("partitioned"):
                            keep = kb if keep is None else keep & kb
                            files_all = files_all | set(bfiles)
                    # un-hashable written type: skip the bloom, stay exact
                dir_iv = stats.get("", {}).get(scol)
                if dir_iv is not None and not _may_match(
                    _stat_deser(dir_iv[0]), _stat_deser(dir_iv[1]), sop, sval
                ):
                    drop = True  # whole-entry interval excludes
                    break
                per_file = {
                    f: s for f, s in stats.items() if f != "" and scol in s
                }
                if not per_file:
                    continue  # no file-level stats: conjunct keeps all
                k = {
                    f
                    for f, s in per_file.items()
                    if _may_match(
                        _stat_deser(s[scol][0]), _stat_deser(s[scol][1]), sop, sval
                    )
                }
                # files with no stats for THIS col stay (conservative)
                k |= files_all - set(per_file)
                keep = k if keep is None else (keep & k)
            if drop or keep == set():
                continue
            if keep is None or keep == files_all or e.get("partitioned"):
                kept.append(e)
            else:
                kept.append({**e, "__files": sorted(keep)})
        entries = kept
    masks = st.get("masks") or []
    for m in masks:
        if m.get("set_exprs"):
            # spec reader feature "mask-update": implemented for the
            # RESTRICTED portable grammar (column refs, numeric/string
            # literals, + - * /, parentheses — the subset writers
            # actually emit). Parse every SET expression up front so a
            # table carrying text outside the grammar still REFUSES at
            # plan time rather than silently returning wrong rows.
            for col, text in m["set_exprs"].items():
                try:
                    _parse_set_expr(text)
                except _SetExprUnsupported as exc:
                    raise ValueError(
                        "table carries an UPDATE mask whose SET "
                        f"expression {text!r} (column {col!r}) is outside "
                        "the portable grammar this reader implements "
                        f"({exc}) — fold_masks the table or use the "
                        "engine's read()"
                    ) from exc
    parts = []
    for e in entries:
        t = _scan_entry(root, e, target)
        for m in masks:
            if e["dir"] in m["dirs"]:
                if m.get("set_exprs"):
                    t = _mask_transform(t, m, target)
                else:
                    t = _mask_filter(t, m["predicate"])
        parts.append(t)
    out = pa.concat_tables(parts) if parts else target.empty_table()
    if st.get("patches"):
        out = _reconcile_patches(root, out, st, target)
    if conj:
        for scol, sop, sval in conj:
            out = out.filter(_pc_compare(out[scol], sop, sval))
    return out


class _SetExprUnsupported(ValueError):
    """SET text outside the portable mask-update grammar."""


_SET_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+\.\d+|\d+)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[+\-*/()]))"
)


def _parse_set_expr(text: str):
    """Parse one SET expression of the PORTABLE mask-update grammar —
    column refs, integer/decimal/string literals, binary + - * /, unary
    minus, parentheses — into a small AST (docs/commit-format.md §mask).
    Anything else (function calls, CASE, comparison operators, ...)
    raises :class:`_SetExprUnsupported`: the caller refuses the table
    instead of mis-evaluating. Standard precedence: */ bind tighter
    than +-; division is FLOAT division (Spark `/` semantics — both
    operands promote to double)."""
    tokens: list[tuple[str, Any]] = []
    pos = 0
    while pos < len(text):
        m = _SET_TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise _SetExprUnsupported(
                f"unrecognized token at {text[pos:][:20]!r}"
            )
        pos = m.end()
        if m.group("num") is not None:
            s = m.group("num")
            tokens.append(("lit", float(s) if "." in s else int(s)))
        elif m.group("str") is not None:
            tokens.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("ident") is not None:
            tokens.append(("col", m.group("ident")))
        else:
            tokens.append(("op", m.group("op")))
    i = 0

    def peek():
        return tokens[i] if i < len(tokens) else None

    def take():
        nonlocal i
        t = tokens[i]
        i += 1
        return t

    def atom():
        t = peek()
        if t is None:
            raise _SetExprUnsupported("truncated expression")
        if t == ("op", "-"):
            take()
            return ("neg", atom())
        if t == ("op", "("):
            take()
            e = addsub()
            if peek() != ("op", ")"):
                raise _SetExprUnsupported("unbalanced parentheses")
            take()
            return e
        if t[0] in ("lit", "col"):
            return take()
        raise _SetExprUnsupported(f"unexpected token {t!r}")

    def muldiv():
        e = atom()
        while peek() in (("op", "*"), ("op", "/")):
            op = take()[1]
            e = (op, e, atom())
        return e

    def addsub():
        e = muldiv()
        while peek() in (("op", "+"), ("op", "-")):
            op = take()[1]
            e = (op, e, muldiv())
        return e

    ast = addsub()
    if i != len(tokens):
        raise _SetExprUnsupported(f"trailing tokens {tokens[i:]!r}")
    return ast


def _eval_set_expr(ast, tbl: pa.Table):
    """Evaluate a parsed SET AST against a table; returns an arrow
    array/chunked-array or a Python scalar. Division promotes both sides
    to float64 (Spark int/int `/` -> double); + - * stay in the input
    types like Spark's non-ANSI arithmetic."""
    import pyarrow.compute as pc

    kind = ast[0]
    if kind == "lit":
        return ast[1]
    if kind == "col":
        if ast[1] not in tbl.schema.names:
            raise _SetExprUnsupported(f"unknown column {ast[1]!r}")
        return tbl.column(ast[1])
    if kind == "neg":
        return pc.negate(_eval_set_expr(ast[1], tbl))
    a = _eval_set_expr(ast[1], tbl)
    b = _eval_set_expr(ast[2], tbl)
    if kind == "/":
        def _f64(x):
            if isinstance(x, (pa.Array, pa.ChunkedArray)):
                return pc.cast(x, pa.float64())
            return float(x)

        return pc.divide(_f64(a), _f64(b))
    return {"+": pc.add, "-": pc.subtract, "*": pc.multiply}[kind](a, b)


def _mask_transform(tbl: pa.Table, mask: dict[str, Any], target: pa.Schema) -> pa.Table:
    """Apply one UPDATE mask: rows where the predicate conjunction is
    TRUE get the SET expressions' values (cast to the column type, float
    truncation allowed — Spark cast semantics); NULL-predicate rows stay
    untouched, matching the engine's `_mask_apply`."""
    import pyarrow.compute as pc

    match = None
    for c, op, v in mask["predicate"]:
        e = _pc_compare(tbl[c], op, _stat_deser(v))
        match = e if match is None else pc.and_kleene(match, e)
    match = pc.fill_null(match, False)
    cols = []
    for field in target:
        old = tbl.column(field.name)
        text = (mask.get("set_exprs") or {}).get(field.name)
        if text is None:
            cols.append(old)
            continue
        val = _eval_set_expr(_parse_set_expr(text), tbl)
        if not isinstance(val, (pa.Array, pa.ChunkedArray)):
            val = pa.scalar(val)
        new = pc.cast(
            val,
            field.type,
            safe=False,  # Spark cast truncates double -> int
        )
        cols.append(pc.if_else(match, new, old))
    return pa.Table.from_arrays(cols, schema=target)


def _mask_filter(tbl: pa.Table, predicate_ser: list) -> pa.Table:
    """Tombstone-mask survivors: rows where the conjunction is not TRUE
    (SQL DELETE — a NULL predicate keeps the row). Kleene AND matches
    the engine's Spark semantics: null AND false = false, null AND true
    = null, and the final null fills to false before inverting."""
    import pyarrow.compute as pc

    match = None
    for c, op, v in predicate_ser:
        e = _pc_compare(tbl[c], op, _stat_deser(v))
        match = e if match is None else pc.and_kleene(match, e)
    keep = pc.invert(pc.fill_null(match, False))
    return tbl.filter(keep)


def _reconcile_patches(
    root: Path, base: pa.Table, st: dict[str, Any], target: pa.Schema
) -> pa.Table:
    """Merge-on-read reconciliation: per bucket-key tuple the NEWEST
    patch commit wins (ALL of its rows for that key — rank semantics),
    tombstoned keys drop, and every patched key's base rows are
    replaced. Null-safe key equality = plain tuple equality here."""
    keys = st.get("bucket_cols") or []
    if not keys:
        raise ValueError("patched table lacks bucket_cols metadata")
    seen: set[tuple] = set()
    patch_parts: list[pa.Table] = []
    for p in sorted(st["patches"], key=lambda p: -p["version"]):
        written = _arrow_schema(p["schema"])
        dset = ds.dataset(str(root / p["dir"]), format="parquet")
        raw = dset.to_table()
        n = raw.num_rows
        cols = []
        have = set(raw.schema.names)
        for field in target:
            if field.name in have:
                cols.append(raw.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(n, field.type))
        data = pa.Table.from_arrays(cols, schema=target)
        dels = raw.column("__patch_deleted").to_pylist()
        key_rows = list(
            zip(*[data.column(k).to_pylist() for k in keys])
        )
        fresh = [i for i, kt in enumerate(key_rows) if kt not in seen]
        keep_idx = [i for i in fresh if not dels[i]]
        if keep_idx:
            patch_parts.append(data.take(keep_idx))
        seen.update(key_rows[i] for i in fresh)
        _ = written  # written schema documented; cast path goes via target
    base_keys = list(zip(*[base.column(k).to_pylist() for k in keys]))
    keep = [i for i, kt in enumerate(base_keys) if kt not in seen]
    out = base.take(keep)
    for p in patch_parts:
        out = pa.concat_tables([out, p])
    return out


if __name__ == "__main__":
    import sys

    path = sys.argv[1]
    ver = int(sys.argv[2]) if len(sys.argv) > 2 else None
    tbl = read_table(path, ver)
    print(tbl.schema)
    print(f"{tbl.num_rows} rows @ version {snapshot(path, ver)['version']}")
