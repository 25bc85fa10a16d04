"""Optimistic concurrency (VERDICT r9 #3): racing writers on one table.

Before r10 any same-version race produced one winner and a
:class:`CommitConflictError` loser with manual recompute-and-retry
guidance. Delta's contract (and the reference's practical one via its
1 h lease lock, reference:odbc2deltalake/db_to_delta.py:218-229) is
automatic retry when commits commute — implemented here as bounded
auto-rebase for the provably-commuting cases (blind append vs blind
append; append vs disjoint metadata-only commit), refusing everything
else exactly as before.

Two harnesses:

- a DETERMINISTIC same-version race: the loser's backend publish hook
  lands the rival's commit the instant the loser tries to publish its
  own — the worst-case interleaving, reproduced exactly, for every
  cell of the conflict matrix (docs/commit-format.md §concurrency);
- REAL two/three-thread races (barrier start) proving concurrent blind
  appends all land without caller retry loops.
"""

from __future__ import annotations

import threading
import uuid

import pytest

from odbc2deltalake_spark.tablestore import (
    CommitConflictError,
    VersionedParquetTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


@pytest.fixture()
def root(tmp_path):
    return tmp_path / f"t{uuid.uuid4().hex[:8]}"


def _base(spark, root, **kw) -> VersionedParquetTable:
    t = VersionedParquetTable(root)
    t.write(_df(spark, [(1, 10), (2, 20)]), **kw)
    return t


def _arm_race(loser: VersionedParquetTable, rival_fn) -> None:
    """Fire ``rival_fn()`` (which commits through its OWN table
    instance/backend) the moment ``loser`` first tries to publish a
    commit — then let the loser's publish proceed against the mutated
    log. Deterministic same-version race, no threads, no timing."""
    backend = loser.backend
    orig = backend.write_text_exclusive
    fired = {"done": False}

    def hook(path: str, text: str) -> None:
        if not fired["done"] and "_commits" in path:
            fired["done"] = True
            rival_fn()
        return orig(path, text)

    backend.write_text_exclusive = hook


def _rows(spark, t):
    return sorted(tuple(r) for r in t.read(spark).select("id", "v").collect())


# ------------------------------------------------- commuting races ----------


def test_blind_append_rebases_over_blind_append(spark, root):
    t1 = _base(spark, root)
    t2 = VersionedParquetTable(root)
    _arm_race(t1, lambda: t2.write(_df(spark, [(3, 30)])))
    v = t1.write(_df(spark, [(4, 40)]))
    # rival landed v1; my commit auto-rebased to v2 — no caller retry
    assert v == 2 == t1.version()
    assert _rows(spark, t1) == [(1, 10), (2, 20), (3, 30), (4, 40)]
    # both data dirs live, versions dense, replay clean at every version
    assert len(t1._state_at()["dirs"]) == 3
    assert _rows(spark, VersionedParquetTable(root)) == _rows(spark, t1)


def test_append_rebases_over_metadata_only_props(spark, root):
    t1 = _base(spark, root)
    t2 = VersionedParquetTable(root)
    _arm_race(t1, lambda: t2.set_properties({"comment": "rival"}))
    v = t1.write(_df(spark, [(3, 30)]))
    assert v == 2
    assert t1.get_property("comment") == "rival"
    assert _rows(spark, t1) == [(1, 10), (2, 20), (3, 30)]


def test_props_rebase_over_append_and_disjoint_props(spark, root):
    t1 = _base(spark, root)
    t2 = VersionedParquetTable(root)
    _arm_race(t1, lambda: t2.write(_df(spark, [(3, 30)])))
    v = t1.set_properties({"a": "1"})
    assert v == 2 and t1.get_property("a") == "1"
    assert _rows(spark, t1) == [(1, 10), (2, 20), (3, 30)]

    t3 = VersionedParquetTable(root)
    _arm_race(t3, lambda: VersionedParquetTable(root).set_properties({"b": "2"}))
    assert t3.set_properties({"c": "3"}) == 4
    assert t3.get_property("b") == "2" and t3.get_property("c") == "3"
    # a schema-bearing racer does not roll the schema back: the props
    # commit carries no schema statement at all
    assert "schema" not in t3._read_commit(4)


def test_rebase_burst_absorbs_multiple_racers(spark, root):
    t1 = _base(spark, root)

    def rivals():
        for i in range(3):
            VersionedParquetTable(root).write(_df(spark, [(10 + i, i)]))

    _arm_race(t1, rivals)
    v = t1.write(_df(spark, [(99, 99)]))
    assert v == 4
    assert len(_rows(spark, t1)) == 6


# ------------------------------------------------- refused races ------------


def test_same_prop_key_race_refused(spark, root):
    t1 = _base(spark, root)
    _arm_race(t1, lambda: VersionedParquetTable(root).set_properties({"k": "r"}))
    with pytest.raises(CommitConflictError):
        t1.set_properties({"k": "mine"})
    # the landed value is the rival's — no silent last-writer overwrite
    assert VersionedParquetTable(root).get_property("k") == "r"


def test_append_vs_schema_change_refused(spark, root):
    t1 = _base(spark, root)
    _arm_race(t1, lambda: VersionedParquetTable(root).drop_column("v"))
    with pytest.raises(CommitConflictError):
        t1.write(_df(spark, [(3, 30)]))
    # the drop stands; a rebased append would have re-stated the wide
    # schema at a higher version and silently resurrected the column
    assert VersionedParquetTable(root).schema().fieldNames() == ["id"]


def test_append_vs_constraint_add_refused(spark, root):
    t1 = _base(spark, root)
    _arm_race(
        t1,
        lambda: VersionedParquetTable(root).set_check_constraint(
            spark, "v_pos", ("v", ">", 0)
        ),
    )
    with pytest.raises(CommitConflictError):
        # v = -5 was never checked against the racer's new constraint
        t1.write(_df(spark, [(3, -5)]))
    assert _rows(spark, VersionedParquetTable(root)) == [(1, 10), (2, 20)]


@pytest.mark.parametrize("plane", ["patch", "merge", "overwrite"])
def test_append_vs_row_mutation_planes_refused(spark, root, plane, monkeypatch):
    """Merge-on-read patches, bucket merges, and overwrites all reorder
    against an append at read time — every one must refuse the rebase,
    same-version race pinned deterministically. (A lazy MASK is the
    exception — its dirs_masked pins its row set, see the commute test
    below.)"""
    monkeypatch.setattr(VersionedParquetTable, "PATCH_MIN_TABLE_ROWS", 1)
    t1 = VersionedParquetTable(root)
    t1.merge_upsert(
        spark, _df(spark, [(1, 10), (2, 20)]), ["id"], target_bucket_rows=4
    )
    rival = VersionedParquetTable(root)
    fns = {
        "patch": lambda: rival.merge_upsert(
            spark, _df(spark, [(2, 99)]), ["id"], strategy="patch"
        ),
        "merge": lambda: rival.merge_upsert(
            spark, _df(spark, [(5, 50)]), ["id"], strategy="rewrite"
        ),
        "overwrite": lambda: rival.write(
            _df(spark, [(7, 70)]), mode="overwrite"
        ),
    }
    _arm_race(t1, fns[plane])
    with pytest.raises(CommitConflictError):
        t1.write(_df(spark, [(3, 30)]))
    # the rival's mutation stands and replays cleanly
    VersionedParquetTable(root).read(spark).collect()


def test_append_rebases_over_lazy_mask(spark, root):
    """The symmetric case to mask-over-append: a blind append racing a
    lazy DELETE lands via rebase — the mask's dirs_masked cannot name
    the append's new dir, so both orders yield the same table."""
    t1 = _base(spark, root)
    rival = VersionedParquetTable(root)
    _arm_race(t1, lambda: rival.delete_where(spark, ("id", "=", 1), lazy=True))
    # the appended row MATCHES the rival's delete predicate — and must
    # survive (the delete pinned its dirs before the append existed)
    v = t1.write(_df(spark, [(1, 111)]))
    assert v == 2 == t1.version()
    assert _rows(spark, t1) == [(1, 111), (2, 20)]


def test_identity_assigning_race_refused(spark, root):
    t1 = VersionedParquetTable(root)
    t1.write(_df(spark, [(1, 10)]).drop("id"), identity_col="id")
    rival = VersionedParquetTable(root)
    _arm_race(
        t1,
        lambda: rival.write(_df(spark, [(0, 7)]).drop("id"), identity_col="id"),
    )
    with pytest.raises(CommitConflictError):
        # both drew generated ids from the same high-water mark — a
        # rebase could land colliding "unique" values
        t1.write(_df(spark, [(0, 8)]).drop("id"), identity_col="id")
    ids = [r["id"] for r in VersionedParquetTable(root).read(spark).collect()]
    assert len(ids) == len(set(ids))


def test_same_txn_app_race_refused_then_idempotent_skip(spark, root):
    t1 = _base(spark, root)
    rival = VersionedParquetTable(root)
    _arm_race(
        t1, lambda: rival.write(_df(spark, [(3, 30)]), txn=("app", 5))
    )
    with pytest.raises(CommitConflictError):
        t1.write(_df(spark, [(3, 30)]), txn=("app", 5))
    # the caller-level retry re-reads the marker and SKIPS the replay —
    # the batch lands exactly once
    head = t1.version()
    assert t1.write(_df(spark, [(3, 30)]), txn=("app", 5)) == head
    assert _rows(spark, t1) == [(1, 10), (2, 20), (3, 30)]


# ------------------------------------------------- real thread races --------


def test_concurrent_blind_appends_all_land(spark, root):
    """VERDICT r9 #3 'done' bar: concurrent blind appends both land
    without caller retry loops — three real threads, barrier start."""
    t0 = _base(spark, root)
    n = 3
    barrier = threading.Barrier(n)
    errors: list[Exception] = []

    def work(i: int) -> None:
        try:
            t = VersionedParquetTable(root)
            barrier.wait(timeout=60)
            t.write(_df(spark, [(100 + i, i)]))
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    assert t0.version() == n  # v0 base + one commit per thread, dense
    got = _rows(spark, VersionedParquetTable(root))
    assert got == [(1, 10), (2, 20), (100, 0), (101, 1), (102, 2)]


def test_concurrent_props_and_append_threads(spark, root):
    t0 = _base(spark, root)
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def appender() -> None:
        try:
            t = VersionedParquetTable(root)
            barrier.wait(timeout=60)
            t.write(_df(spark, [(3, 30)]))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def propper() -> None:
        try:
            t = VersionedParquetTable(root)
            barrier.wait(timeout=60)
            t.set_properties({"owner": "propper"})
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    ths = [threading.Thread(target=appender), threading.Thread(target=propper)]
    for th in ths:
        th.start()
    for th in ths:
        th.join(timeout=300)
    assert not errors, errors
    assert t0.version() == 2
    assert t0.get_property("owner") == "propper"
    assert _rows(spark, t0) == [(1, 10), (2, 20), (3, 30)]


# ------------------------------------------ lazy-mask commuting races -------


def test_lazy_mask_rebases_over_blind_append(spark, root):
    """A lazy DELETE racing a blind append lands via rebase AND absorbs
    the racer's new dirs into dirs_masked: the erasure is complete as
    of its COMMIT version, so even matching rows the rival appended at
    a lower version are masked — commit-order-consistent, no write
    skew (ADVICE r10; Delta refuses this race outright, this engine
    keeps both writers live and still honors the erasure)."""
    t1 = _base(spark, root)  # (1,10), (2,20)
    rival = VersionedParquetTable(root)
    # the rival's appended row MATCHES the delete predicate
    _arm_race(t1, lambda: rival.write(_df(spark, [(1, 111)])))
    out = t1.delete_where(spark, ("id", "=", 1), lazy=True)
    assert out["version"] == 2 == t1.version()
    got = _rows(spark, t1)
    # base (1,10) deleted AND the rival's matching (1,111) masked too:
    # a reader at head sees NO row matching the committed erasure
    assert got == [(2, 20)]
    # the non-matching remainder of any absorbed dir must survive a
    # fold (the absorbed dir is filtered, not dropped)
    t1.fold_masks(spark)
    assert _rows(spark, VersionedParquetTable(root)) == [(2, 20)]


def test_lazy_update_mask_absorbs_racing_append(spark, root):
    """Same absorption for UPDATE masks: the SET applies to matching
    rows the racer appended below the mask's commit version, exactly
    as a sequential update at head would."""
    t1 = _base(spark, root)  # (1,10), (2,20)
    rival = VersionedParquetTable(root)
    _arm_race(t1, lambda: rival.write(_df(spark, [(1, 111), (9, 90)])))
    out = t1.update_where(spark, {"v": "v + 1000"}, ("id", "=", 1), lazy=True)
    assert out["version"] == 2 == t1.version()
    # both the base (1,10) and the rival's (1,111) transformed; the
    # rival's non-matching (9,90) untouched
    assert _rows(spark, t1) == [(1, 1010), (1, 1111), (2, 20), (9, 90)]


def test_lazy_mask_absorbs_append_burst(spark, root):
    """A mask racing a BURST of appends absorbs every racer's dirs
    across successive rebase attempts: each retry classifies only the
    commits above its last claimed version, so no dir is absorbed twice
    and none is missed."""
    t1 = _base(spark, root)  # (1,10), (2,20)
    burst = {"left": 3}
    orig = t1.backend.write_text_exclusive

    def hook(path: str, text: str):
        if burst["left"] > 0 and "_commits" in path:
            burst["left"] -= 1
            # each rival row MATCHES the delete predicate
            VersionedParquetTable(root).write(
                _df(spark, [(1, 100 + burst["left"])])
            )
        return orig(path, text)

    t1.backend.write_text_exclusive = hook
    out = t1.delete_where(spark, ("id", "=", 1), lazy=True)
    assert out["version"] == 4 == t1.version()
    # base dir + 3 absorbed rival dirs all masked
    assert out["dirs_masked"] == 4
    assert _rows(spark, VersionedParquetTable(root)) == [(2, 20)]
    t1.fold_masks(spark)
    assert _rows(spark, VersionedParquetTable(root)) == [(2, 20)]


def test_lazy_mask_vs_lazy_mask_refused(spark, root):
    """Two racing masks refuse: an UPDATE mask transforms the values a
    later DELETE predicate reads through, so commit order changes the
    result — not commuting."""
    t1 = _base(spark, root)
    rival = VersionedParquetTable(root)
    _arm_race(
        t1,
        lambda: rival.update_where(
            spark, {"v": "v + 1"}, ("id", "=", 2), lazy=True
        ),
    )
    with pytest.raises(CommitConflictError):
        t1.delete_where(spark, ("v", "=", 21), lazy=True)
    # the rival's update stands and replays cleanly
    assert _rows(spark, VersionedParquetTable(root)) == [(1, 10), (2, 21)]


def test_lazy_mask_vs_widening_append_refused(spark, root):
    """A schema-widening racer refuses the mask rebase: the mask commit
    re-states ITS schema at a higher version, which would silently roll
    the widening back on replay."""
    t1 = _base(spark, root)
    rival = VersionedParquetTable(root)
    wide = spark.createDataFrame([(9, 90, "x")], "id long, v long, tag string")
    _arm_race(t1, lambda: rival.write(wide, merge_schema=True))
    with pytest.raises(CommitConflictError):
        t1.delete_where(spark, ("id", "=", 1), lazy=True)
    assert VersionedParquetTable(root).schema().fieldNames() == [
        "id", "v", "tag",
    ]


# ------------------------------------------ patch key-disjointness races ----


def test_patch_rebases_over_key_disjoint_append_via_stats(spark, root):
    """VERDICT r10 #3: a patch upsert racing a blind append lands via
    rebase when the appended dir's footer stats PROVE it cannot contain
    the patch's target keys — both writers commit, no caller retry."""
    t1 = VersionedParquetTable(root)
    t1.merge_upsert(
        spark, _df(spark, [(i, 10 * i) for i in range(8)]), ["id"],
        target_bucket_rows=4,
    )
    rival = VersionedParquetTable(root)
    _arm_race(
        t1,
        lambda: rival.write(
            _df(spark, [(101, 1)]), mode="append", stats_cols=["id"]
        ),
    )
    t1.merge_upsert(spark, _df(spark, [(2, 999)]), ["id"], strategy="patch")
    got = dict(_rows(spark, VersionedParquetTable(root)))
    assert got[2] == 999 and got[101] == 1 and len(got) == 9


def test_patch_refuses_overlapping_append(spark, root):
    """Stats overlap (the appended dir may hold the patch's key):
    refuse — read-time reconciliation would depend on commit order."""
    t1 = VersionedParquetTable(root)
    t1.merge_upsert(
        spark, _df(spark, [(i, 10 * i) for i in range(8)]), ["id"],
        target_bucket_rows=4,
    )
    rival = VersionedParquetTable(root)
    _arm_race(
        t1,
        lambda: rival.write(
            _df(spark, [(2, 1)]), mode="append", stats_cols=["id"]
        ),
    )
    with pytest.raises(CommitConflictError):
        t1.merge_upsert(spark, _df(spark, [(2, 999)]), ["id"],
                        strategy="patch")
    # the rival's append stands; the patch left no trace
    got = dict(_rows(spark, VersionedParquetTable(root)))
    assert (2, 999) not in got.items() and got[0] == 0


def test_patch_refuses_unprovable_append(spark, root):
    """A bare append (no stats, no bloom) gives NO disjointness proof —
    refuse even though the keys happen to be disjoint: the classifier
    never guesses."""
    t1 = VersionedParquetTable(root)
    t1.merge_upsert(
        spark, _df(spark, [(i, 10 * i) for i in range(8)]), ["id"],
        target_bucket_rows=4,
    )
    rival = VersionedParquetTable(root)
    _arm_race(t1, lambda: rival.write(_df(spark, [(101, 1)]), mode="append"))
    with pytest.raises(CommitConflictError):
        t1.merge_upsert(spark, _df(spark, [(2, 999)]), ["id"],
                        strategy="patch")


def test_patch_rebases_over_range_overlapping_append_via_bloom(spark, root):
    """The bloom half of the proof: the appended dir's id RANGE straddles
    the patch key, but its bloom bitmap proves the key absent — commute.
    (No stats recorded, so only the bloom can decide.)"""
    t1 = VersionedParquetTable(root)
    t1.merge_upsert(
        spark, _df(spark, [(i, 10 * i) for i in range(8)]), ["id"],
        target_bucket_rows=4,
    )
    rival = VersionedParquetTable(root)
    _arm_race(
        t1,
        lambda: rival.write(
            _df(spark, [(1, 1), (3, 3)]), mode="append", bloom_cols=["id"]
        ),
    )
    t1.merge_upsert(spark, _df(spark, [(2, 999)]), ["id"], strategy="patch")
    rows = _rows(spark, VersionedParquetTable(root))
    assert (2, 999) in rows and (1, 1) in rows and (3, 3) in rows


# ------------------------------------- property: random same-version races --

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# every mutation plane a writer can race on; (kind, needs_target_id)
_OP_KINDS = [
    "append", "props", "del_mask", "upd_mask", "patch", "merge", "overwrite",
]

# which loser kinds land via rebase over which rival kinds — the
# conflict matrix (docs/commit-format.md §concurrency) as data
_COMMUTES = {
    "append": {"append", "props", "del_mask", "upd_mask"},
    "props": {"append", "props", "del_mask", "upd_mask"},
    "del_mask": {"append", "props"},
    "upd_mask": {"append", "props"},
    # patch (r11, VERDICT r10 #3): commutes with a blind append IFF the
    # appended dir provably cannot hold the patch's keys — in this
    # harness the rival append records id stats and its key (100+tag)
    # is range-disjoint from every patch target (0.._N_BASE-1), so the
    # proof always lands; props commits are row-free
    "patch": {"append", "props"},
    # merge / overwrite publish without the rebase: always lose
    "merge": set(),
    "overwrite": set(),
}

_N_BASE = 8


def _apply_model(model: dict[int, int], kind: str, x: int, tag: int) -> None:
    """Sequential-order semantics for the op that landed FIRST (the
    rival): computed against the base it read, which IS the current
    model here."""
    if kind == "append":
        model[100 + tag] = tag
    elif kind == "del_mask":
        model.pop(x, None)
    elif kind == "upd_mask":
        if x in model:
            model[x] += 100
    elif kind in ("patch", "merge"):
        model[x] = 999
    elif kind == "overwrite":
        model.clear()
        model[77] = 7
    # props: no row effect


def _apply_loser_model(model: dict[int, int], base: dict[int, int],
                       kind: str, x: int, tag: int) -> None:
    """A REBASED loser's semantics are plain sequential semantics at
    its landing version: a rebased mask absorbs racing appends' dirs
    into dirs_masked, so it applies to every row committed below it —
    including rows the rival landed (commit-order-consistent erasure,
    ADVICE r10)."""
    if kind == "append":
        model[100 + tag] = tag
    elif kind == "del_mask":
        model.pop(x, None)
    elif kind == "upd_mask":
        if x in model:
            model[x] += 100
    elif kind == "patch":
        model[x] = 999


def _run_op(spark, t, kind: str, x: int, tag: int, prop_key: str):
    if kind == "append":
        # stats on the append are what make a racing patch's key-
        # disjointness proof decidable (bare appends refuse the patch)
        return t.write(_df(spark, [(100 + tag, tag)]), mode="append",
                       stats_cols=["id"])
    if kind == "props":
        return t.set_properties({prop_key: str(tag)})
    if kind == "del_mask":
        return t.delete_where(spark, ("id", "=", x), lazy=True)
    if kind == "upd_mask":
        return t.update_where(spark, {"v": "v + 100"}, ("id", "=", x),
                              lazy=True)
    if kind == "patch":
        return t.merge_upsert(spark, _df(spark, [(x, 999)]), ["id"],
                              strategy="patch")
    if kind == "merge":
        return t.merge_upsert(spark, _df(spark, [(x, 999)]), ["id"],
                              strategy="rewrite")
    if kind == "overwrite":
        return t.write(_df(spark, [(77, 7)]), mode="overwrite")
    raise AssertionError(kind)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    loser=st.sampled_from(_OP_KINDS),
    rival=st.sampled_from(_OP_KINDS),
    x_loser=st.integers(min_value=0, max_value=_N_BASE - 1),
    x_rival=st.integers(min_value=0, max_value=_N_BASE - 1),
    same_prop_key=st.booleans(),
)
def test_random_same_version_races_match_model(
    spark, tmp_path_factory, monkeypatch, loser, rival,
    x_loser, x_rival, same_prop_key,
):
    """Any two mutation-plane ops raced on the same version: the loser
    either lands via rebase (exactly the matrix's commuting cells, with
    mask semantics pinned to the base row set) or raises
    CommitConflictError — and the final table equals the model either
    way. Generalizes the hand-picked matrix-cell tests to arbitrary
    plane pairs and overlapping target rows."""
    monkeypatch.setattr(VersionedParquetTable, "PATCH_MIN_TABLE_ROWS", 1)
    root = tmp_path_factory.mktemp("occprop") / f"t{uuid.uuid4().hex[:8]}"
    t1 = VersionedParquetTable(root)
    base = {i: 10 * i for i in range(_N_BASE)}
    t1.merge_upsert(
        spark, _df(spark, list(base.items())), ["id"], target_bucket_rows=4
    )
    t2 = VersionedParquetTable(root)

    # distinct prop keys unless the draw says collide (props-vs-props
    # is the only pair where the key matters)
    rival_key = "k" if same_prop_key else "kr"
    _arm_race(
        t1, lambda: _run_op(spark, t2, rival, x_rival, tag=1,
                            prop_key=rival_key)
    )
    model = dict(base)
    _apply_model(model, rival, x_rival, tag=1)

    commutes = rival in _COMMUTES[loser]
    if loser == "props" and rival == "props" and same_prop_key:
        commutes = False
    if commutes:
        _run_op(spark, t1, loser, x_loser, tag=2, prop_key="k")
        _apply_loser_model(model, base, loser, x_loser, tag=2)
    else:
        with pytest.raises(CommitConflictError):
            _run_op(spark, t1, loser, x_loser, tag=2, prop_key="k")
    got = dict(_rows(spark, VersionedParquetTable(root)))
    assert got == model, (loser, rival, x_loser, x_rival, got, model)


def test_patch_disjointness_proof_on_string_keys(spark, root):
    """The range half of the patch proof over STRING bucket keys —
    lexicographic interval disjointness (and the refuse when ranges
    overlap), exercising the non-numeric _stat_ser/_stat_deser path."""
    t1 = VersionedParquetTable(root)
    base = spark.createDataFrame(
        [(f"k{i:02d}", i) for i in range(8)], "id string, v long"
    )
    t1.merge_upsert(spark, base, ["id"], target_bucket_rows=4)
    rival = VersionedParquetTable(root)
    # disjoint: rival appends z-prefixed keys, patch targets k-prefixed
    _arm_race(
        t1,
        lambda: rival.write(
            spark.createDataFrame([("z99", 1)], "id string, v long"),
            mode="append", stats_cols=["id"],
        ),
    )
    t1.merge_upsert(
        spark,
        spark.createDataFrame([("k02", 999)], "id string, v long"),
        ["id"], strategy="patch",
    )
    got = {r["id"]: r["v"] for r in t1.read(spark).collect()}
    assert got["k02"] == 999 and got["z99"] == 1 and len(got) == 9

    # overlapping string range: refuse
    rival2 = VersionedParquetTable(root)
    _arm_race(
        t1,
        lambda: rival2.write(
            spark.createDataFrame([("k05", 1)], "id string, v long"),
            mode="append", stats_cols=["id"],
        ),
    )
    with pytest.raises(CommitConflictError):
        t1.merge_upsert(
            spark,
            spark.createDataFrame([("k05", 777)], "id string, v long"),
            ["id"], strategy="patch",
        )
