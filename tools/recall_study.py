"""Measured ANN recall-vs-nprobe curve for SCALE.md.

For a sample of query vectors, compares IVF probed search against exact
brute-force cosine top-k at several nprobe settings and prints
recall@10 per setting — the accuracy/cost dial an operator of
`sim_ann_ivf`'s shape exposes at scale.

    python tools/recall_study.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from odbc2deltalake_spark.queries.registry import load_table
from odbc2deltalake_spark.session import get_spark

K = 10
N_QUERIES = 20
NPROBES = (1, 2, 4, 8)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("recall_study")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()  # study harness only — sf0.01 fits the driver
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    n, d = X.shape
    rng_ids = ids[:N_QUERIES]

    # exact top-k per query (excluding self)
    exact: dict[int, set] = {}
    for qi in range(N_QUERIES):
        sims = Xn @ Xn[qi]
        order = np.argsort(-sims)
        top = [int(ids[j]) for j in order if j != qi][:K]
        exact[int(ids[qi])] = set(top)

    # IVF: k-means centroids (same derivation as the engine: ~sqrt(n))
    ncent = max(4, int(np.sqrt(n)))
    rng = np.random.RandomState(42)
    cent = Xn[rng.choice(n, ncent, replace=False)].copy()
    for _ in range(10):
        assign = np.argmax(Xn @ cent.T, axis=1)
        for c in range(ncent):
            m = assign == c
            if m.any():
                v = Xn[m].mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    assign = np.argmax(Xn @ cent.T, axis=1)

    print(f"n={n} d={d} centroids={ncent} queries={N_QUERIES} k={K}")
    for nprobe in NPROBES:
        hits = tot = 0
        scanned = 0
        for qi in range(N_QUERIES):
            cells = np.argsort(-(cent @ Xn[qi]))[:nprobe]
            mask = np.isin(assign, cells)
            scanned += int(mask.sum())
            cand = np.where(mask)[0]
            sims = Xn[cand] @ Xn[qi]
            order = cand[np.argsort(-sims)]
            got = [int(ids[j]) for j in order if j != qi][:K]
            hits += len(set(got) & exact[int(ids[qi])])
            tot += K
        frac = scanned / (N_QUERIES * n)
        print(
            f"nprobe={nprobe}: recall@{K} = {hits / tot:.3f}, "
            f"scanned {frac:.1%} of corpus per query"
        )


if __name__ == "__main__":
    main()
