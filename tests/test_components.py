"""Scale pins for min-label propagation (operators/components.py) — the
production loop behind dedup_cluster, driven on synthetic graphs shaped
like the 100 TB failure mode: ONE giant near-dup cluster (boilerplate
duplicated across millions of docs) whose LSH bucket produces hub nodes
with degree ~ cluster size. See SCALE.md §dedup for the measured study.
"""

from __future__ import annotations

import pytest

from odbc2deltalake_spark.operators.components import min_label_propagation


def _edges(spark, pairs):
    """Undirected pair list -> symmetric (src, dst) frame."""
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.union(df.select("dst", "src"))


def test_hub_star_mega_component_converges_fast(spark):
    """A degree-50k hub (the giant-bucket shape: every member paired
    with the bucket representative) must label all members with the
    component min in 2 rounds — rounds follow DIAMETER, never size —
    and the hub's degree must not break the join/agg (map-side partial
    min + AQE skew join absorb it)."""
    n = 50_000
    fwd = spark.range(1, n + 1).selectExpr("cast(0 as long) AS src", "id AS dst")
    rev = spark.range(1, n + 1).selectExpr("id AS src", "cast(0 as long) AS dst")
    edges = fwd.union(rev)
    # a second, disjoint small component to prove labels don't bleed
    other = _edges(spark, [(n + 10, n + 11), (n + 11, n + 12)])
    labels, rounds = min_label_propagation(edges.union(other), driver_cap=0)
    assert rounds <= 3  # star diameter 2 (+1 confirming round)
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert len(got) == n + 1 + 3
    assert all(got[i] == 0 for i in range(0, n + 1))
    assert all(got[i] == n + 10 for i in (n + 10, n + 11, n + 12))


def test_chain_rounds_track_diameter(spark):
    """On a path graph the min label travels one hop per round: an
    L-edge chain needs ~L rounds (+1 to confirm) — the documented
    'rounds = diameter' contract, pinned exactly."""
    L = 12
    labels, rounds = min_label_propagation(
        _edges(spark, [(i, i + 1) for i in range(L)]), driver_cap=0
    )
    assert L <= rounds <= L + 1
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert all(got[i] == 0 for i in range(L + 1))


def test_non_convergence_refuses_loudly(spark):
    """A diameter past max_rounds must raise — a silent partial
    clustering would under-deduplicate downstream."""
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_propagation(
            _edges(spark, [(i, i + 1) for i in range(8)]), max_rounds=3,
            driver_cap=0,
        )


def test_matches_bruteforce_on_random_graph(spark):
    """Cross-check against a from-scratch union-find on a pseudo-random
    graph (deterministic edge list)."""
    pairs = [((i * 7919) % 400, (i * 104729) % 400) for i in range(300)]
    pairs = [(a, b) for a, b in pairs if a != b]
    labels, _ = min_label_propagation(_edges(spark, pairs), driver_cap=0)

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert got == want


def test_driver_fast_path_matches_loop(spark):
    """r14: below _DRIVER_CC_CAP the solve runs driver-side (bounded
    collect + union-find). Labels must equal the distributed loop's on
    the same graph, and the fast path must report rounds=0."""
    pairs = [((i * 7919) % 500, (i * 104729) % 500) for i in range(400)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    fast, fr = min_label_propagation(e)
    slow, sr = min_label_propagation(e, driver_cap=0)
    assert fr == 0 and sr >= 1
    got_f = {r["node"]: r["lbl"] for r in fast.collect()}
    got_s = {r["node"]: r["lbl"] for r in slow.collect()}
    assert got_f == got_s


def test_driver_cap_is_a_hard_bound(spark):
    """A graph one edge past the cap must take the distributed loop —
    the probe is limit(cap+1), so nothing above the cap is collected."""
    from odbc2deltalake_spark.operators import components as C

    n = 30
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    # cap below the directed edge count (2n) -> loop path (rounds >= 1)
    _, rounds = min_label_propagation(e, driver_cap=n)
    assert rounds >= 1
    # cap at exactly the directed edge count -> driver path
    _, rounds = min_label_propagation(e, driver_cap=2 * n)
    assert rounds == 0
