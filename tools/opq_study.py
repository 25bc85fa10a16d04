"""OPQ study: does the PCA-rotated (eigenvalue-balanced) pre-transform
actually buy quantization quality on the bench corpus, and what does it
cost at query time?

Measures, on the sf0.1 embeddings (2000 × 64):

- total squared reconstruction error, plain PQ vs OPQ-rotated PQ
  (rotation preserves L2, so the numbers are directly comparable);
- mean recall@10 (64-candidate ADC + exact rerank) over 20 probe
  queries, plain IVF-PQ vs OPQ-IVF-PQ, same coarse quantizer;
- index build wall time for both.

    python tools/opq_study.py [sf_dir]

Writes docs/opq_study.json.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from odbc2deltalake_spark.operators.clustering import (  # noqa: E402
    fit_kmeans_centroids,
)
from odbc2deltalake_spark.operators.ivfpq import IvfPqIndex  # noqa: E402
from odbc2deltalake_spark.operators.pca import (  # noqa: E402
    opq_rotation,
    rotate_vectors,
)
from odbc2deltalake_spark.operators.pq import (  # noqa: E402
    encode_pq,
    fit_pq_codebooks,
)
from odbc2deltalake_spark.queries.registry import load_table  # noqa: E402
from odbc2deltalake_spark.session import get_spark  # noqa: E402

DIM, M, K, NCENT = 64, 8, 16, 8


def sq_err(vecs) -> float:
    books = fit_pq_codebooks(vecs, DIM, M, K, 2)
    codes = encode_pq(vecs, DIM, M, books)
    cb = {(r["sub"], r["cid"]): np.array(r["cv"]) for r in books.collect()}
    xs = {r["vec_id"]: np.array(r["v"]) for r in vecs.collect()}
    cs = {r["vec_id"]: r["codes"] for r in codes.collect()}
    return sum(
        float(
            (
                (v - np.concatenate([cb[(s, c)] for s, c in enumerate(cs[i])]))
                ** 2
            ).sum()
        )
        for i, v in xs.items()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("opq_study")
    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=True)
    rows = {r["vec_id"]: np.array(r["v"]) for r in vectors.collect()}

    out: dict = {"sf_dir": sf_dir, "n": len(rows), "dim": DIM, "m": M, "k": K}

    plain_err = sq_err(vectors)
    r = opq_rotation(vectors, "v", DIM, M)
    rotated = rotate_vectors(vectors, "v", r).localCheckpoint(eager=True)
    opq_err = sq_err(rotated)
    out["pq_sq_err"] = round(plain_err, 1)
    out["opq_sq_err"] = round(opq_err, 1)
    out["err_reduction_pct"] = round(100 * (1 - opq_err / plain_err), 1)

    cent = fit_kmeans_centroids(vectors, NCENT, 2)
    results = {}
    for name, rotate in (("ivfpq", False), ("opq_ivfpq", True)):
        root = tempfile.mkdtemp(prefix=f"opq_study_{name}_")
        idx = IvfPqIndex(f"{root}/idx", DIM, M, K)
        t0 = time.perf_counter()
        idx.build(vectors, cent, rotate=rotate)
        build_s = time.perf_counter() - t0
        hits = tot = 0
        t0 = time.perf_counter()
        for qid in sorted(rows)[:20]:
            q = rows[qid]
            truth = {
                vid
                for vid, _ in sorted(
                    (
                        (vid, float(((v - q) ** 2).sum()))
                        for vid, v in rows.items()
                        if vid != qid
                    ),
                    key=lambda t: (t[1], t[0]),
                )[:10]
            }
            got = idx.search(
                spark, list(q), nprobe=4, k=10, candidates=64,
                rerank_vectors=vectors.filter(F.col("vec_id") != qid),
            )
            hits += len({r["vec_id"] for r in got.collect()} & truth)
            tot += 10
        results[name] = {
            "build_s": round(build_s, 2),
            "recall_at_10": round(hits / tot, 3),
            "query_s_mean": round((time.perf_counter() - t0) / 20, 3),
        }
    out["index"] = results
    print(json.dumps(out, indent=1))
    (REPO / "docs" / "opq_study.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
