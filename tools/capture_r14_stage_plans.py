"""Stage-level plan captures for r14 claims that live in intermediate
jobs (index/fit pipelines), which the final returned frame's plan cannot
show (checkpoints truncate lineage).

    python tools/capture_r14_stage_plans.py <suffix> [sf_dir]

Writes plans/r14/stage_<name>_<suffix>.txt for:
- pq_encode: encode_pq over the embeddings corpus (wave 1 claim: pure
  map, no explode+groupBy reassembly shuffle; wave 6 claim: by-sub
  nested broadcast lookup).
- pq_assign: _assign_codes(keep_sv=True) (wave 1 claim: sv carried, no
  re-attach join; wave 6 claim: element_at lookup).
- kmeans_assign: clustering.assign_cosine (wave 5 claim: hoisted norms).
- minhash_sigs: the signature aggregation feeding dedup_minhash_lsh.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from odbc2deltalake_spark.session import get_spark

OUT_DIR = Path("/root/repo/plans/r14")


def cap(name: str, suffix: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    out = OUT_DIR / f"stage_{name}_{suffix}.txt"
    out.write_text(f"# stage {name} [{suffix}]\n" + buf.getvalue())
    print(f"wrote {out}")


def main() -> int:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture_r14_stage_plans")

    from odbc2deltalake_spark.operators import pq as pqm
    from odbc2deltalake_spark.operators.clustering import (
        assign_cosine,
        fit_kmeans_centroids,
    )
    from odbc2deltalake_spark.queries import dedup_ops as dd
    from odbc2deltalake_spark.queries.clustering_ops import _corpus

    vecs = _corpus(spark, sf_dir)
    books = pqm.fit_pq_codebooks(vecs, 64, 8, 16, 0)
    cap("pq_encode", suffix, pqm.encode_pq(vecs, 64, 8, books))
    subs = pqm._subvectors(vecs, 64, 8)
    try:
        assign = pqm._assign_codes(subs, books, keep_sv=True)
    except TypeError:  # pre-wave-1 checkout: no keep_sv parameter
        assign = pqm._assign_codes(subs, books)
    cap("pq_assign", suffix, assign)
    cent = fit_kmeans_centroids(vecs, 8, 0)
    cap("kmeans_assign", suffix, assign_cosine(vecs.select("vec_id", "v"), cent))
    sh, sigs, _bands = dd._minhash_bands(spark, sf_dir)
    cap("minhash_sigs", suffix, sigs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
