"""Connected components by iterative min-label propagation — the
distributed primitive behind near-dup clustering (queries/dedup_ops.py:
dedup_cluster) — extracted (r14, VERDICT r13 #8) so a synthetic
mega-component can be driven through the EXACT production loop in tests
and scale studies, not a copy of it.

Skew analysis at 100 TB (a corpus with one giant near-dup cluster —
e.g. a boilerplate page duplicated millions of times — lands every
member in one LSH band bucket, producing HUB nodes whose degree
approaches the cluster size):

- The per-round aggregation ``groupBy(src).min(lbl)`` is ALGEBRAIC:
  Spark's partial (map-side) aggregation collapses each input partition
  to one row per src before the shuffle, so a hub's million incident
  edges cost one shuffled row per upstream partition — hub degree never
  concentrates on one reducer.
- The per-round join ``edges.dst == labels.node`` is the skew point: a
  hub's dst value repeats degree-many times, so one sort-merge partition
  receives degree-many rows. Two mitigations are in force: (a) AQE skew
  join (``spark.sql.adaptive.skewJoin.enabled``, on in session.py)
  splits the oversized partition at runtime, and (b) the labels side is
  one row per node — small relative to edges — so Spark's planner
  typically broadcasts it, making the join map-side and skew-immune.
- Round count is the component DIAMETER, not its size: the giant
  cluster is diameter-2 from any bucket representative's star shape
  (or diameter-k for k chained buckets), so the loop's driver
  coordination stays O(diameter), never O(|cluster|).

tests/test_components.py pins: correctness on a hub-star mega-component
(degree 50k), correctness + exact round count on a chain (diameter =
rounds), and the loud non-convergence refusal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: edge-count bound under which the component solve runs driver-side.
#: Same strategy-by-size pattern as Bm25Index.search's candidate cap:
#: below the cap a bounded collect + union-find replaces O(diameter)
#: sequential Spark rounds (each round is a full scheduling round trip —
#: measured r14: 2 rounds over a 512-edge sf0.1 graph cost 1.09 s of
#: pure per-round latency); past the cap the distributed loop runs
#: unchanged, so the 100 TB path is exactly the loop below.
_DRIVER_CC_CAP = 100_000


def _driver_union_find(rows) -> dict:
    """Min-label connected components on a collected edge list — the
    same labeling the propagation loop converges to (component minimum),
    exact by construction; pinned against the loop in
    tests/test_components.py."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            # union by min: the min node id becomes the root, so every
            # root IS its component's label
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def min_label_propagation(
    edges: DataFrame, max_rounds: int = 50, driver_cap: int = _DRIVER_CC_CAP
) -> tuple[DataFrame, int]:
    """Labels every node of the undirected graph with its component's
    minimum node id.

    ``edges``: directed representation with columns (src, dst) — pass
    BOTH directions of each undirected edge (the caller owns that, as
    dedup_cluster does, because it knows whether its pair list is
    already symmetric).

    Returns ``(labels, rounds)`` — labels has columns (node, lbl), one
    row per node appearing as a src; ``rounds`` is the number of
    propagation rounds executed. Each round is one join + one algebraic
    min aggregation; labels are localCheckpoint'ed per round so lineage
    (and recomputation cost) does not grow with iteration count, and
    convergence is a scan of the materialized frame, not a second join.
    Raises after ``max_rounds`` without convergence — a silent partial
    clustering would under-deduplicate, so refuse loudly.

    ``driver_cap`` (r14): when the graph has at most this many directed
    edges, the solve is a bounded ``limit(cap+1)`` probe + collect +
    union-find on the driver (``rounds`` returned as 0) — identical
    labels (component minimum is algorithm-independent), none of the
    per-round scheduling latency. Pass ``driver_cap=0`` to force the
    distributed loop (the scale tests do). The cap bounds driver memory
    exactly like the BM25 candidate cap: past it, nothing is collected.
    """
    edges = edges.select("src", "dst")
    if driver_cap:
        # bounded probe: tasks stop at cap+1 rows, so this is O(cap)
        # even on a 100 TB edge list
        probe = edges.limit(driver_cap + 1).count()
        if probe <= driver_cap:
            labels_map = _driver_union_find(
                edges.collect()
            )
            spark = edges.sparkSession
            node_t = edges.schema["src"].dataType.simpleString()
            out = spark.createDataFrame(
                list(labels_map.items()),
                f"node {node_t}, lbl {node_t}",
            )
            return out, 0
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for rnd in range(1, max_rounds + 1):
        nb_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        # carry the previous label through the checkpoint so convergence
        # is a scan of the materialized frame — not a join of new-vs-old
        # labels (which added a full shuffle per round)
        # lazy checkpoint + count: the convergence count is the FIRST
        # action over the checkpoint-marked RDD, so one job both
        # materializes the round's labels and counts the changes — the
        # former eager-checkpoint-then-count shape paid a second
        # scheduling round trip per iteration for the same answer
        new_labels = (
            labels.join(nb_min, labels.node == nb_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nb_lbl"), F.col("lbl"))
                ).alias("lbl"),
                F.col("lbl").alias("prev"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("lbl") != F.col("prev")).count()
        labels = new_labels.select("node", "lbl")
        if changed == 0:
            return labels, rnd
    raise RuntimeError(
        f"min-label propagation did not converge in {max_rounds} rounds "
        "(component diameter exceeds the bound) — raise max_rounds or "
        "pre-contract the giant component"
    )
