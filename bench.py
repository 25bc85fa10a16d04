"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. Run with `python bench.py`.

One SparkSession for the whole run (JVM startup excluded from timings, as
on a long-lived cluster); a warm-up pass touches every table and spins up
the Python worker pool so per-query numbers measure the plan, not process
cold start.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod
from odbc2deltalake_spark.session import get_spark
from odbc2deltalake_spark.queries.registry import TABLE_NAMES, load_table

# canary normalization anchor (VERDICT r8 #6): canary 1.42 s <-> headline
# 35.64 s on the idle build host; module-level so tools/round_close.py's
# bench-trend backfill uses the SAME constant, never a copy
CANARY_ANCHOR_SEC = 1.42

# second, WORKLOAD-SHAPED canary anchor (VERDICT r10 #2): the CPU canary
# is a pure integer sum and over-corrects — the headline is dominated by
# Spark scheduling + parquet IO, so a flat round can read as a ±20%
# normalized swing. This canary is a small parquet scan+groupBy over the
# bench lineitem (scheduler- and IO-sensitive, fixed plan every round);
# min-of-3, calibrated on the IDLE r11 build host (0.257 in-bench at
# raw 32.50 s / CPU-canary 1.682 — the same run's raw total matches the
# r10 driver artifact, so this is the reference weather). The anchor's
# absolute value only shifts the normalized series by a constant —
# round-over-round deltas are anchor-independent — so the calibration
# is cosmetic by construction. round_close flags a regression only when
# raw AND BOTH normalizations agree in direction.
WORKLOAD_ANCHOR_SEC = 0.26

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "q4_order_priority",
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q17_small_quantity",
    "ev_hourly_rollup",
    "ev_sessionize",
    "scd2_current_rows",
    "u1_latest_pk_union",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "sim_ann_topk",
    "sim_lsh_buckets",
    # the most expensive non-TPC-H shapes — benched so their trend is
    # visible (r3 verdict: cost had never been measured)
    "ev_asof_join",
    "ev_range_join",
    "dedup_cluster",
    "sim_ann_ivf",
]

# Shapes added in r5 — timed and reported under "extras" WITHOUT counting
# toward the headline total, so the total stays comparable with the
# r1→r3 trend line (adding entries to HEADLINE would read as a
# regression that is really just a bigger denominator).
EXTRAS = [
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "corpus_decontaminate",
    "corpus_shuffle_order",
    "text_repetition_score",
    # r5 second wave: the expensive new shapes get a trend line from day 1
    "dedup_substring_spans",
    "text_unigram_logprob",
    "ev_funnel",
    "ev_retention",
    "emb_kmeans",
    "dedup_substring_strip",
    "hybrid_search",
    # r5 third wave: retrieval fusion, DSIR, and the trained classifier
    "hybrid_search_rrf",
    "corpus_dsir_sample",
    "text_quality_classifier",
    "bm25_search",
    "corpus_decontaminate_fuzzy",
    "mv_incremental_rollup",
    "ev_path_transitions",
    "corpus_leakage_safe_split",
    # r6: global sequence packing (distributed prefix sum)
    "corpus_pack_sequences",
    # r7: distributed-ntile RFM + audio metadata (promoted flagships)
    "ev_rfm_segments",
    "mm_audio_meta",
    # r7 second wave: budget selection + keep-best retention
    "corpus_token_budget_select",
    "dedup_keep_best",
    # r8: delta-join IVM + the DML lifecycle (trend lines from day 1)
    "mv_incremental_join",
    "store_dml_roundtrip",
    # r10: zero-shuffle letter entropy + the C4 gate funnel
    "text_letter_entropy",
    "corpus_filter_funnel",
    # r11: distributed PCA + the three new store-lifecycle rows + the
    # streaming==batch rollup
    "emb_pca_project",
    "store_check_constraint_gate",
    "store_txn_exactly_once",
    "store_shallow_clone_divergence",
    "stream_hourly_rollup",
    "stream_cdc_scd2",
    "corpus_semantic_quality",
    "sim_ann_opq",
    # r12: the full delta algorithm (deletes + strange updates) under
    # foreachBatch, and the persisted BM25 inverted index (2-batch
    # build + term-sliced search) — trend lines from day 1
    "stream_cdc_full",
    "bm25_index_search",
    # r13: hybrid fusion over both persisted indexes (the per-process
    # index cache makes the rerun sample the production read path) and
    # the baseline JPEG Huffman+IDCT row — trend lines from day 1
    "hybrid_index_rrf",
    "mm_jpeg_pixel_stats",
    # r14: frozen-weight classifier deploy scoring (zero-shuffle map)
    "text_classifier_score",
    # r14: frozen-basis PCA projection (zero-shuffle map)
    "emb_pca_apply",
    # r14: persisted incremental substring index (build + append + spans)
    "dedup_substring_incremental",
]


def _bench_cdc_engine(spark, sf_dir: str) -> dict[str, float]:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from odbc2deltalake_spark import ColInfo, DataFrameSource, WriteConfig, write_db_to_delta

    ev = load_table(spark, sf_dir, "events").drop("props").withColumn(
        "rv", F.col("event_id")
    )
    infos = [
        ColInfo(
            f.name,
            f.dataType,
            "rowversion" if f.name == "rv" else f.dataType.simpleString(),
            True,
        )
        for f in ev.schema.fields
    ]
    src = DataFrameSource(ev, infos, primary_keys=["event_id"])
    cfg = WriteConfig(delta_col="rv")
    dest = tempfile.mkdtemp(prefix="bench_cdc_")
    out: dict[str, float] = {}
    try:
        t0 = time.time()
        write_db_to_delta(spark, src, dest, cfg)
        out["cdc_full_load"] = round(time.time() - t0, 3)

        upd = ev.filter(F.col("event_id") % 100 == 0).withColumn(
            "rv", F.col("rv") + 10_000_000
        )
        base = ev.filter(F.col("event_id") % 100 != 0)
        new = ev.limit(1000).select(
            (F.col("event_id") + 20_000_000).alias("event_id"),
            "ts",
            "user_id",
            "event_type",
            "value",
            (F.col("rv") + 20_000_000).alias("rv"),
        )
        src.set_df(base.unionByName(upd).unionByName(new))
        t0 = time.time()
        write_db_to_delta(spark, src, dest, cfg)
        out["cdc_delta_load"] = round(time.time() - t0, 3)

        t0 = time.time()
        write_db_to_delta(spark, src, dest, cfg)
        out["cdc_noop_load"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(dest, ignore_errors=True)
    return out


def _bench_store_maintenance(spark, sf_dir: str) -> dict[str, float]:
    """r7 DML + OPTIMIZE trend line: a 10-commit events-derived table,
    one selective delete (stats-pruned rewrite), one partial compact
    (OPTIMIZE WHERE over the last 3 commits' key range), one full
    compact. Timed under the same session as the rest of the bench."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from odbc2deltalake_spark.tablestore import VersionedParquetTable

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    dest = tempfile.mkdtemp(prefix="bench_dml_")
    out: dict[str, float] = {}
    try:
        t = VersionedParquetTable(dest + "/t")
        n = ev.count()
        step = max(1, n // 10)
        for i in range(10):
            t.write(
                ev.filter(
                    (F.col("event_id") >= i * step)
                    & (F.col("event_id") < (i + 1) * step)
                ),
                mode="append",
                stats_cols=["event_id"],
            )
        t0 = time.time()
        t.delete_where(spark, ("event_id", ">=", 9 * step))
        out["store_delete_where"] = round(time.time() - t0, 3)
        t0 = time.time()
        t.compact(spark, where=("event_id", ">=", 6 * step))
        out["store_compact_partial"] = round(time.time() - t0, 3)
        t0 = time.time()
        t.compact(spark)
        out["store_compact_full"] = round(time.time() - t0, 3)
        # r8 deferred-mutation trend lines: a lazy delete is a metadata
        # write (near-zero by design — a regression here means a scan
        # crept into the commit path), fold_masks materializes it
        t0 = time.time()
        t.delete_where(spark, ("event_id", "<", step // 2), lazy=True)
        out["store_lazy_delete"] = round(time.time() - t0, 3)
        t0 = time.time()
        t.fold_masks(spark)
        out["store_fold_masks"] = round(time.time() - t0, 3)
        # merge-on-read patch commit + fold on a bucketized keys index
        kt = VersionedParquetTable(dest + "/k")
        kt.merge_upsert(
            spark, ev.select("event_id", "user_id"), ["event_id"]
        )
        batch = ev.select("event_id", "user_id").filter(
            F.col("event_id") % 97 == 0
        )
        t0 = time.time()
        kt.merge_upsert(spark, batch, ["event_id"], strategy="patch")
        out["store_patch_merge"] = round(time.time() - t0, 3)
        t0 = time.time()
        kt.fold_patches(spark)
        out["store_fold_patches"] = round(time.time() - t0, 3)
        # r9 keyed lookup trend line: driver-side bucket routing must
        # stay job-free (a regression means the python xxhash64 chain
        # stopped covering the key type and every lookup pays a scan)
        t0 = time.time()
        got = kt.read_keys(spark, [1, step, 5 * step]).count()
        out["store_keyed_lookup"] = round(time.time() - t0, 3)
        assert got == 3, got
        # r9 bloom trend line: point lookup through per-file bitmaps on
        # a hash-spread key (intervals useless by construction) — the
        # pair (write-with-bloom, probe) regresses if collection leaks
        # into O(table) driver work or probing re-launches Spark jobs
        bt = VersionedParquetTable(dest + "/b")
        t0 = time.time()
        bt.write(
            ev.repartition(8, "event_id"),
            mode="append",
            stats_cols=["event_id"],
            per_file_stats=True,
            bloom_cols=["event_id"],
        )
        out["store_bloom_write"] = round(time.time() - t0, 3)
        probe_ids = [i * step + 7 for i in range(8)]
        t0 = time.time()
        got = bt.read(
            spark, skip_where=("event_id", "in", probe_ids)
        ).count()
        out["store_bloom_lookup"] = round(time.time() - t0, 3)
        assert got <= len(probe_ids)
        # r10 trend line: a bucket rewrite on a bloom-indexed table pays
        # one bitmap re-collection pass — regressions here mean the
        # preservation scan leaked into O(table) work per merge
        t0 = time.time()
        bt.merge_upsert(
            spark,
            ev.filter(F.col("event_id") % 89 == 0),
            ["event_id"],
            num_buckets=8,
        )
        out["store_merge_bloom"] = round(time.time() - t0, 3)
        assert any(d.get("bloom") for d in bt._state_at()["dirs"])
        # r10 trend line: OCC auto-rebase overhead — an append racing a
        # rival must land via rebase in metadata time (a regression
        # means the rebase re-ran data work or the conflict escaped)
        from odbc2deltalake_spark.tablestore import (  # noqa: PLC0415
            VersionedParquetTable as _VPT,
        )

        ot = _VPT(dest + "/o")
        ot.write(ev.select("event_id", "user_id").limit(1000), mode="append")
        rival = _VPT(dest + "/o")
        orig_x = ot.backend.write_text_exclusive
        armed = {"on": True}

        def _race_hook(path, text):
            if armed["on"] and "_commits" in path:
                armed["on"] = False
                rival.write(
                    ev.select("event_id", "user_id").limit(10),
                    mode="append",
                )
            return orig_x(path, text)

        ot.backend.write_text_exclusive = _race_hook
        t0 = time.time()
        v = ot.write(
            ev.select("event_id", "user_id").limit(10), mode="append"
        )
        out["store_occ_rebase"] = round(time.time() - t0, 3)
        assert v == 2, v
    finally:
        shutil.rmtree(dest, ignore_errors=True)
    return out


def _contending_jvms() -> int:
    """Count OTHER Spark JVMs on the host. Concurrent local[32] sessions
    inflate timings 25-40% uniformly (measured r7: 41.9 s contended vs
    30-33 s clean on the same tree — the whole of the r6 'regression'),
    so the bench waits briefly for them and RECORDS the residual count either
    way: a contended run is flagged in its own JSON, not discovered a
    round later."""
    import subprocess

    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,args"], capture_output=True, text=True, timeout=10
        ).stdout
    except Exception:
        return -1  # unknown
    me = os.getpid()
    n = 0
    for line in out.splitlines():
        if "SparkSubmit" in line or "pyspark-shell" in line:
            try:
                pid = int(line.strip().split()[0])
            except (ValueError, IndexError):
                continue
            if pid != me:
                n += 1
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # contention guard BEFORE the session spins up (our own JVM would
    # otherwise count): wait up to 120 s for other Spark JVMs to drain
    contended = _contending_jvms()
    deadline = time.time() + 120
    while contended > 0 and time.time() < deadline:
        time.sleep(5)
        contended = _contending_jvms()
    spark = get_spark("bench")

    # warm-up: table scans + python worker pool (not timed)
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    warm = spark.range(0, 64, 1, 64)
    warm.mapInPandas(lambda it: it, "id long").count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0

    # CDC engine lifecycle at this scale factor (events as source table):
    # full load, an incremental load (1% updates + 1k inserts), and the
    # no-change short-circuit — the engine's write-side throughput. Runs
    # first: the engine issues ~20 small sequential jobs, which are
    # sensitive to accumulated session overhead late in a run. The many
    # small sequential jobs also make this block the most host-stall
    # sensitive number in the bench (observed 5.1s vs 9.5s for the same
    # delta-load plan minutes apart), so it always runs twice with
    # per-entry min — both samples recorded for auditability.
    reruns: dict[str, dict[str, float]] = {}
    cdc_first = _bench_cdc_engine(spark, sf_dir)
    cdc_second = _bench_cdc_engine(spark, sf_dir)
    for name, dt in cdc_first.items():
        reruns[name] = {"first": dt, "rerun": cdc_second[name]}
        timings[name] = min(dt, cdc_second[name])
        total += timings[name]

    extras_pre = _bench_store_maintenance(spark, sf_dir)

    # Min-of-2 for EVERY headline entry (VERDICT r11 #2). The former rule
    # re-ran only entries above max(2.5, 3×median) — asymmetric: a warm-up
    # stall landing just UNDER the cutoff was kept (r11: dedup_exact's
    # 2.384 s first sample vs its real 0.5 s plan faked a +3.4% headline
    # "regression"), while one just OVER it was resampled away. Two passes
    # per entry with per-entry min measure the plan, not JIT/shuffle
    # warm-up or host stalls, and cost ~30 s of bench wall at sf0.1.
    # Both samples are recorded in `reruns` so the resampling is
    # auditable, not an invisible downward bias.
    for name in HEADLINE:
        samples = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            samples.append(round(time.time() - t0, 3))
        reruns[name] = {"first": samples[0], "rerun": samples[1]}
        timings[name] = min(samples)

    # extras keep the outlier-rerun discipline (2× wall for all ~40 of
    # them is real money); cutoff from the already-stall-free headline
    head_times = sorted(timings[n] for n in HEADLINE)
    median = head_times[len(head_times) // 2]
    outlier_cutoff = max(2.5, 3 * median)

    total += sum(timings[n] for n in HEADLINE)

    extras: dict[str, float] = {}
    for name in EXTRAS:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        dt = round(time.time() - t0, 3)
        if dt > outlier_cutoff:  # same host-stall discipline as HEADLINE
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            rerun = round(time.time() - t0, 3)
            reruns[name] = {"first": dt, "rerun": rerun}
            dt = min(dt, rerun)
        extras[name] = dt

    extras.update(extras_pre)
    # host-speed canary: a fixed CPU-bound Spark job (same plan every
    # round) whose min-of-3 wall time calibrates cross-round comparisons
    # — two rounds' headline totals are only comparable after dividing
    # out the canary ratio (observed: the same tree measures 32-40 s on
    # this sandbox's host depending on the day, with contending_jvms=0
    # both times; the canary makes that drift auditable instead of
    # reading as a plan regression)
    canary = min(
        _timeit(
            lambda: spark.range(0, 200_000_000, 1, 64)
            .selectExpr("sum(id * 2 + 1) as s")
            .collect()
        )
        for _ in range(3)
    )
    # Canary normalization (VERDICT r8 #6): scale the total by the r8
    # calibration anchor (canary 1.42 s <-> headline 35.64 s on the idle
    # build host) so round-over-round comparisons factor out host CPU
    # weather without re-running. The canary captures CPU speed, not all
    # IO/page-cache variance (SCALE.md calibration table) — read the
    # normalized total as a trend line, not a truth.
    normalized = total * (CANARY_ANCHOR_SEC / canary) if canary else total
    # workload-shaped canary (VERDICT r10 #2): same scan+shuffle profile
    # as the headline queries — catches scheduler/IO weather the CPU
    # canary is blind to. Fixed plan: one lineitem scan, one groupBy.
    wl_canary = min(
        _timeit(
            lambda: spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg({"l_quantity": "sum"})
            .collect()
        )
        for _ in range(3)
    )
    wl_normalized = (
        total * (WORKLOAD_ANCHOR_SEC / wl_canary) if wl_canary else total
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "extras": extras,
                "reruns": reruns,
                "outlier_cutoff": round(outlier_cutoff, 3),
                "contending_jvms": contended,
                "host_canary_sec": round(canary, 3),
                "normalized_total_sec": round(normalized, 3),
                "canary_anchor_sec": CANARY_ANCHOR_SEC,
                "workload_canary_sec": round(wl_canary, 3),
                "workload_normalized_total_sec": round(wl_normalized, 3),
                "workload_anchor_sec": WORKLOAD_ANCHOR_SEC,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    # The driver archives only the last ~2000 chars of output and the full
    # dict above is ~2.3KB, which truncated the r7 total out of the
    # artifact (VERDICT r7 "what's wrong" #2). Repeat the headline number
    # in a compact final line (metric/value/unit/queries/sf only — no
    # extras/reruns bulk) so the tail always carries it; the full dict
    # stays for auditing.
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "contending_jvms": contended,
                "host_canary_sec": round(canary, 3),
                "normalized_total_sec": round(normalized, 3),
                "workload_canary_sec": round(wl_canary, 3),
                "workload_normalized_total_sec": round(wl_normalized, 3),
            }
        )
    )


def _timeit(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
