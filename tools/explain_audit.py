"""Physical-plan audit for the headline queries.

Captures `explain(formatted)` for each audited query at the given sf dir,
writes the full plan to docs/plans/<name>.txt, and checks the physical
properties the engine claims:

- **no_row_python**: no `BatchEvalPython` (row-at-a-time Python UDF) —
  and no `ArrowEvalPython` either; the only Python in any plan is the
  intended Arrow-batched `MapInPandas`/`FlatMapGroupsInPandas` kernels.
- **pushdown**: queries that filter fact-table scan columns show
  non-empty `PushedFilters` on the parquet scan (AQE formatted mode; the
  filters named per query below).
- **broadcast**: queries with dimension joins use `BroadcastHashJoin`
  exclusively — a `SortMergeJoin` appearing where a broadcast is claimed
  is a regression.
- **no_cartesian**: no `CartesianProduct` outside the intended
  single-row broadcast-probe cross joins.

(`WholeStageCodegen` spans are not visible in pre-execution AQE formatted
plans, so codegen coverage is not asserted here; the no-Python checks
cover the part of that claim the engine controls.)

    python tools/explain_audit.py [sf_dir] [extra_query ...]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod
from odbc2deltalake_spark.session import get_spark

# queries where a cross join IS the plan (single-row broadcast probe)
CROSS_JOIN_OK = {"sim_ann_topk", "sim_ann_ivf", "sim_embedding_neardup"}
# queries whose scans must show pushed filters (they filter scan columns)
PUSHDOWN_EXPECTED = {
    "q1_pricing_summary",   # l_shipdate <=
    "q3_shipping_priority", # segment / date bounds
    "q5_local_supplier",    # region name, order date range
    "q6_forecast_revenue",  # date + discount + quantity range
    "q10_returned_items",   # returnflag, date range
    "sim_ann_ivf",          # vec_id < centroids / = query id
    "sim_ann_topk",         # vec_id = query id
    "ev_funnel",            # event_type = step filters
}
# queries with dimension joins that must all be broadcast
BROADCAST_EXPECTED = {
    "q3_shipping_priority",
    "q5_local_supplier",
    "q10_returned_items",
    "q18_large_orders",
    "text_unigram_logprob",  # broadcast vocab + one-row total
}
# queries allowed an Exchange SinglePartition feeding a Window — ONLY
# for frames that are constant-sized BY CONSTRUCTION (the documented
# aggregate-window policy). An unpartitioned window over a frame that
# grows with the data is a global sort through one task (the r6
# ev_rfm_segments scale-killer); everything not listed here is gated.
SINGLE_PARTITION_WINDOW_OK = {
    # (r7: q15_top_supplier, corpus_temperature_sample,
    # corpus_shuffle_order and corpus_pack_sequences all converted their
    # windows to broadcast-join forms and left this list)
    "ev_moving_avg",  # ordered sliding window over the per-day rollup
                      # frame — bounded by the calendar, and a moving
                      # average genuinely needs the ordered frame
}


def single_partition_windows(plan: str) -> list[str]:
    """Tree lines where a Window(/GroupLimit) is fed by an Exchange whose
    arguments are SinglePartition — the unpartitioned-window shape."""
    sp_ids = {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) Exchange\b[^(]*?Arguments: SinglePartition",
            plan,
            re.S,
        )
    }
    hits: list[str] = []
    lines = plan.split("\n\n")[0].splitlines()
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow(GroupLimit)? \(", ln):
            # physical chain is Window -> Sort -> Exchange (Sort may be
            # elided), so the feeding Exchange sits within 2 lines
            for la in lines[i + 1 : i + 4]:
                m = re.search(r"Exchange \((\d+)\)", la)
                if m and m.group(1) in sp_ids:
                    hits.append(ln.strip())
                    break
    return hits

# queries allowed a top-level GLOBAL sort whose input the detector
# cannot prove bounded — ONLY for outputs that are genuinely ordered
# deliverables of bounded size. A global orderBy over output that grows
# with the data (a kept sample, a replicated mixture stream) is a
# full range shuffle nothing downstream needs — the r8 sampling-trio
# finding; everything not listed here is gated.
GLOBAL_SORT_OK: set[str] = {
    "q20_excess_suppliers",  # TPC-H Q20 mandates ORDER BY s_name; the
    # sorted frame is the supplier DIMENSION semi-joined down (never a
    # fact table), which the join-recursion cannot prove bounded
}

# chain-walk node classes for unbounded_global_sorts(): walking DOWN
# from a global Sort, the first decisive node classifies the sorted
# frame. Reducers bound it (aggregate/limit-sized output); terminals
# mean the sort ranges over data-proportional rows (scan/join/explode
# output); pass-throughs keep walking.
_SORT_REDUCERS = re.compile(
    r"\b(HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"TakeOrderedAndProject|GlobalLimit|CollectLimit|LocalLimit|"
    r"AggregateInPandas)\b"
)
_SORT_PASS_THROUGH = re.compile(
    r"\b(Project|Filter|Exchange|BroadcastExchange|AQEShuffleRead|Sort|"
    r"ColumnarToRow|"
    r"InputAdapter|WholeStageCodegen|Window|WindowGroupLimit|Coalesce|"
    r"ReusedExchange|BroadcastQueryStage|ShuffleQueryStage|"
    r"TableCacheQueryStage|InMemoryTableScan|InMemoryRelation|"
    r"DeserializeToObject|SerializeFromObject|AdaptiveSparkPlan|"
    r"ResultQueryStage)\b"
)


def _tree_nodes(tree_lines: list[str]) -> list[tuple[int, str]]:
    """(depth, line) per tree line — depth is the column where the node
    text starts after the `+- : *` connector art, so children are
    strictly deeper than their parent and siblings share a depth."""
    out = []
    for ln in tree_lines:
        if not ln.strip():
            continue
        stripped = ln.lstrip(" +:-")
        d = len(ln) - len(stripped)
        out.append((d, stripped.lstrip("* ")))
    return out


def unbounded_global_sorts(plan: str) -> list[str]:
    """Tree lines where a GLOBAL Sort's input is not provably bounded —
    i.e. the sort ranges over data-proportional rows. Classification
    recurses the plan tree below the Sort: an aggregate/limit bounds
    its subtree (aggregate-sized output); a join is bounded iff EVERY
    child is; a scan/explode/union/pandas-kernel is unbounded;
    pass-through nodes defer to their child. A trailing ``.orderBy`` on
    an aggregated, top-k, or join-of-aggregates frame passes; one on a
    sample/stream/score output fails. Heuristic by design: unknown node
    kinds classify as unbounded (conservative), with GLOBAL_SORT_OK as
    the documented escape."""
    # global flag per Sort id lives in the details section:
    # "(5) Sort ...\nInput ...\nArguments: [...], true, 0"
    # the (?!\(\d+\) ) guard keeps the scan inside the Sort's own detail
    # block — without it a LOCAL sort (false flag) could skip ahead and
    # steal a later node's matching Arguments line
    global_ids = {
        m.group(1)
        for m in re.finditer(
            r"\((\d+)\) Sort\b[^\n]*\n(?:(?!\(\d+\) )[^\n]*\n)*?"
            r"Arguments: \[[^\n]*\], true, \d+",
            plan,
        )
    }
    if not global_ids:
        return []
    nodes = _tree_nodes(plan.split("\n\n")[0].splitlines())

    def children(i: int) -> list[int]:
        d = nodes[i][0]
        out, j = [], i + 1
        child_d = None
        while j < len(nodes) and nodes[j][0] > d:
            if child_d is None:
                child_d = nodes[j][0]
            if nodes[j][0] == child_d:
                out.append(j)
            j += 1
        return out

    def bounded(i: int) -> bool:
        name = nodes[i][1]
        if _SORT_REDUCERS.search(name):
            return True
        if re.search(
            r"\b(Join|CartesianProduct|BroadcastNestedLoopJoin)\b", name
        ):
            return all(bounded(c) for c in children(i))
        if _SORT_PASS_THROUGH.search(name):
            ch = children(i)
            return bool(ch) and all(bounded(c) for c in ch)
        return False  # scan/explode/union/pandas kernel/unknown

    hits: list[str] = []
    for i, (_, name) in enumerate(nodes):
        m = re.search(r"\bSort \((\d+)\)", name)
        if not m or m.group(1) not in global_ids:
            continue
        ch = children(i)
        if not (ch and all(bounded(c) for c in ch)):
            hits.append(name.strip())
    return hits


AUDIT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_quantity",
    "q19_discounted_revenue",
    "q22_global_sales",
    "ev_hourly_rollup",
    "ev_sessionize",
    "ev_rollup",
    "ev_interevent_gaps",
    "ev_asof_join",
    "ev_range_join",
    "scd2_current_rows",
    "w1_latest_per_key",
    "u1_latest_pk_union",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_topk",
    "sim_ann_ivf",
    "sim_neardup_multiprobe",
    "sim_lsh_buckets",
    "text_quality_score",
    "text_pii_scrub",
    "mm_decode_meta",
    "corpus_hash_sample",
    "corpus_source_quota",
    "corpus_pack_bins",
    # r5 additions: the TPC-H tail and the corpus decontamination/
    # repetition/shuffle trio
    "q2_min_cost_supplier",
    "q11_important_values",
    "q12_late_shipping",
    "q16_supplier_counts",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "corpus_decontaminate",
    "text_repetition_score",
    "corpus_shuffle_order",
    # dedup_cluster excluded: building its DataFrame executes the
    # label-propagation loop (driver-coordinated iterations)
    # round-5 additions: substring-span dedup, corpus-LM scoring, funnel
    # and retention analytics (emb_kmeans excluded: iterative, like
    # dedup_cluster)
    "dedup_substring_spans",
    "text_unigram_logprob",
    "ev_funnel",
    "ev_retention",
    "corpus_temperature_sample",
    "corpus_chunk_windows",
    "dedup_substring_strip",
    "ev_pivot_daily",
    "text_tfidf_topk",
    "ev_json_extract",
    "ev_moving_avg",
    "ev_unpivot",
    "hybrid_search",
    "q_stat_aggregates",
    "ev_value_ranks",
    # in-round r5 additions: rank fusion and DSIR (text_quality_classifier
    # excluded: iterative, like dedup_cluster/emb_kmeans;
    # corpus_leakage_safe_split excluded: it drives dedup_cluster's loop)
    "hybrid_search_rrf",
    "corpus_dsir_sample",
    "bm25_search",
    "ev_volume_anomaly",
    "corpus_decontaminate_fuzzy",
    # r6: global sequence packing (two-level distributed prefix sum)
    "corpus_pack_sequences",
    # r7: RFM segmentation (distributed exact ntile — must stay free of
    # single-partition windows, the r6 finding)
    "ev_rfm_segments",
    # r7: token-budget selection (distributed prefix sum over the
    # quality order; dedup_keep_best excluded: drives dedup_cluster's
    # iterative loop)
    "corpus_token_budget_select",
    # r8 second wave: exact stratified sampling + mixture reweighting
    "corpus_stratified_sample",
    "corpus_mixture_weights",
    "corpus_mixture_apply",
    # r7 second wave: calendar gap fill, CUBE grouping sets, bigram LM
    "ev_gap_fill_daily",
    "ev_cube",
    "text_bigram_logprob",
    # r8: exhaustive coverage (VERDICT r7 #5) — every non-iterative
    # registry query is either here or in EXCLUDED, enforced by
    # tests/test_plan_quality.py. Queries whose build runs a
    # prerequisite loop (dedup_cluster) still audit the POST-loop plan.
    "a1_watermark_probe",
    "a4_emptiness_probe",
    "approx_heavy_hitters",
    "approx_user_cardinality",
    "approx_value_percentiles",
    "corpus_e2e_recipe",
    "corpus_leakage_safe_split",
    "corpus_mixture_sample",
    "dedup_keep_best",
    "dedup_ngram_jaccard",
    "ev_path_transitions",
    "ev_salted_agg",
    "j1_anti_join",
    "j2_pk_ts_join",
    "j3_keylist_semi_join",
    "mm_audio_meta",
    "mm_feature_vectors",
    "mm_frame_sample",
    "mm_payload_digest",
    "mm_resize",
    "mv_incremental_rollup",
    "mv_incremental_join",
    "p10_full_load_snapshot",
    "p2_cast_trim_projection",
    "p6_delta_filter",
    "p9_watermark_cap",
    "q_price_percentiles",
    "scd2_history_shape",
    "sim_ann_pq",
    "sim_embedding_neardup",
    "sim_neardup_bucketed",
    "corpus_semantic_decontaminate",
    "sim_ann_ivfpq_search",
    # r13: incremental build + append + exact-mode search — same
    # post-build search plan as sim_ann_ivfpq_search
    "sim_ann_ivfpq_incremental",
    # r15: bounded ADC search (candidates < n) — the LUT-scored variant
    "sim_ann_ivfpq_adc",
    "text_fingerprint",
    "text_lang_id",
    "text_token_count",
    "u2_except_deletes",
    # r9: LM perplexity filter (rides the bigram LM + one-row cutoff)
    # and the source-overlap contamination matrix (rides the jaccard
    # candidate generator)
    "text_perplexity_filter",
    "dedup_source_overlap",
    # r9: embedding preprocessing stats (whitening moments, norm-outlier
    # screen — both shuffle-light aggregates over the embeddings table)
    "emb_dim_stats",
    "emb_norm_outliers",
    # r9: cohort LTV curves (user_id agg + same-key fact join — AQE
    # reuses the partitioning, no extra exchange)
    "ev_cohort_ltv",
    # r9: corpus length profile (single scan, map-side partials)
    "corpus_length_histogram",
    # r9: provenance cross-tab (cells + one-row broadcast total)
    "corpus_source_lang_matrix",
    # r10: fixed-alphabet letter entropy (pure map, zero shuffle) and
    # the C4-style gate funnel (one scan, 7 conditional counters,
    # 7-row stack)
    "text_letter_entropy",
    "corpus_filter_funnel",
    # r11: the PCA projection — the fit is a one-pass mapInPandas
    # sufficient-statistics collect at build; the RETURNED frame is the
    # zero-shuffle zip_with projection map this audits
    "emb_pca_project",
    # r11: centroid quality gate — one scan + two single-row broadcasts
    # (the centroid and the percentile cut); zero data-sized shuffles
    "corpus_semantic_quality",
    # r11: real PNG encode->decode->stats — one per-row Arrow kernel,
    # no shuffle
    "mm_png_pixel_stats",
    # r13: baseline JPEG encode->Huffman+IDCT decode->stats — the same
    # per-row Arrow kernel shape as the PNG row, no shuffle
    "mm_jpeg_pixel_stats",
    # r14: frozen-weight classifier deploy gate — a zero-shuffle
    # codegen'd map (weights as an array literal, one fold per row)
    "text_classifier_score",
    # r14: frozen-basis PCA projection — four 64-double array literals,
    # one zip_with+aggregate fold per component, zero shuffle
    "emb_pca_apply",
    # r14: persisted incremental substring index — zero-shuffle gram
    # build, batch-proportional appends, per-doc windows over the
    # duplicated grams only
    "dedup_substring_incremental",
]

# Registry queries deliberately NOT audited, each with the structural
# reason. tests/test_plan_quality.py asserts AUDIT + EXCLUDED covers the
# registry exactly — exclusion is a documented decision, never an
# omission.
EXCLUDED = {
    "dedup_cluster": (
        "iterative label propagation (driver-coordinated rounds, "
        "per-round localCheckpoint); the returned frame is a checkpoint "
        "scan with no plan to audit — the post-loop consumers "
        "dedup_keep_best / corpus_leakage_safe_split / corpus_e2e_recipe "
        "ARE audited"
    ),
    "emb_kmeans": (
        "iterative Lloyd rounds (same driver-coordinated shape as "
        "dedup_cluster); per-round assignment is broadcast-argmax, "
        "pinned by tests/test_clustering.py numpy parity"
    ),
    "text_quality_classifier": (
        "iterative full-batch gradient-descent trainer; the stateless "
        "scoring side is the audited text_quality_score plan"
    ),
    "text_bpe_vocab": (
        "iterative merge loop (one bounded pair-count job per round); "
        "returns a driver-built merge table with no distributed plan — "
        "scale design documented in operators/bpe.py, exactness in "
        "tests/test_bpe.py"
    ),
    "sim_semantic_dedup": (
        "drives emb_kmeans' iterative loop plus an applyInPandas "
        "per-cluster kernel; numpy-parity gated in "
        "tests/test_clustering.py"
    ),
    "sim_ann_opq": (
        "iterative PQ Lloyd rounds over the PCA-rotated corpus (same "
        "driver-coordinated shape as sim_ann_pq, which is also "
        "excluded); rotation orthonormality, quantization-error win vs "
        "plain PQ, and the recall floor are gated in tests/test_pca.py"
    ),
    "store_dml_roundtrip": (
        "multi-commit store DML lifecycle executed at build; returns a "
        "checkpointed frame — the rewrite-engine plans are property- "
        "tested (tests/test_dml_properties.py) and the query itself "
        "asserts stats pruning confined the UPDATE"
    ),
    "store_gdpr_erasure": (
        "multi-commit lazy-tombstone lifecycle executed at build; "
        "returns a checkpointed frame — the mask filters are plain JVM "
        "predicates on the same scans the plan gate already audits, "
        "and lazy-vs-eager CDF/row equivalence is pinned in "
        "tests/test_lazy_delete.py"
    ),
    "store_schema_evolution": (
        "three-commit widen/add/drop lifecycle executed at build; "
        "returns a checkpointed frame — the cast-union read shape is "
        "the already-audited snapshot scan, and evolution semantics "
        "(widening, late-added NULLs, drop guards, re-add refusal) are "
        "pinned in tests/test_tablestore.py + tests/test_drop_column.py"
    ),
    "store_time_travel": (
        "three-commit store lifecycle executed at build; returns a "
        "checkpointed frame — timestamp resolution is control-plane "
        "(commit JSON only) and the read itself is the already-audited "
        "snapshot scan; resolution semantics (monotonization, missing "
        "ts, clock regression) pinned in tests/test_timestamp_travel.py"
    ),
    "store_point_lookup": (
        "store write + bloom-pruned read executed at build; returns a "
        "checkpointed frame — the pruning contract (interval stats keep "
        "every file, the bloom cuts to <= ids + FP slack) is asserted "
        "INSIDE the query and pinned across null/widening/mask edges in "
        "tests/test_bloom_skipping.py"
    ),
    "store_mor_roundtrip": (
        "multi-commit merge-on-read lifecycle (three patch commits) "
        "executed at build; returns a checkpointed frame — the "
        "read-time reconciliation plan (rank over delta-sized patches, "
        "AQE-broadcast anti-join) is exercised with the chain "
        "outstanding and pinned CDF/row-exact vs the rewrite path in "
        "tests/test_merge_patch.py"
    ),
    "mv_cdf_retraction": (
        "multi-commit merge+DML lifecycle whose refreshes fold through "
        "read_changes_fold; returns a checkpointed view — the fold "
        "shape (no classification join, cost-guard routing) is pinned "
        "by tests/test_materialized_view.py and the SCALE.md study"
    ),
    "mv_join_retraction": (
        "multi-commit DML+merge lifecycle on a keyed join view "
        "(MaterializedJoin left_key retraction mode); returns a "
        "checkpointed view — the fold shape (CDF images merged by fact "
        "PK, bucket-pruned delete keys, no re-baseline) is pinned by "
        "tests/test_materialized_join.py and the query's own history "
        "assertion"
    ),
    "mv_incremental_distinct": (
        "multi-commit merge+DML lifecycle on the two-level distinct-"
        "count view (MaterializedDistinct); returns a checkpointed "
        "view — the inner occurrence view's fold shape is the audited "
        "MaterializedAggregate machinery and read==recompute across "
        "re-key/empty-group mutations is pinned by "
        "tests/test_materialized_distinct.py"
    ),
    "store_occ_append_race": (
        "three-commit concurrent-writer lifecycle with an injected "
        "same-version race executed at build; returns a checkpointed "
        "frame — the read is the already-audited snapshot scan, and "
        "the OCC conflict matrix is pinned per cell in "
        "tests/test_occ_rebase.py"
    ),
    "store_merge_bloom_lookup": (
        "write + two merges + bloom-pruned read executed at build; "
        "returns a checkpointed frame — the pruning contract (bitmaps "
        "re-collected by every bucket rewrite, file cut <= ids + FP "
        "slack) is asserted INSIDE the query and pinned in "
        "tests/test_bloom_skipping.py::test_merge_preserves_bloom_index"
    ),
    "store_check_constraint_gate": (
        "constraint-lifecycle store writes executed at build (add over "
        "validated rows, enforced append, atomic violating refuse — all "
        "asserted INSIDE the query); returns a checkpointed frame — "
        "enforcement plans are the write-riding Observations audited "
        "via tests/test_constraints.py"
    ),
    "store_txn_exactly_once": (
        "idempotent-writer lifecycle executed at build (replayed + "
        "stale txn batches asserted skipped in-query); returns a "
        "checkpointed frame — the marker check is one control-plane "
        "property read, pinned in tests/test_tablestore.py txn cases"
    ),
    "store_shallow_clone_divergence": (
        "clone + divergent-DML lifecycle executed at build (zero-copy "
        "clone asserted in-query); returns a checkpointed union — "
        "copy-on-write and own-root vacuum are pinned in "
        "tests/test_clone.py"
    ),
    "stream_hourly_rollup": (
        "Structured Streaming query executed at build (availableNow "
        "into a memory sink); returns a checkpointed scan of the final "
        "complete-mode table — the streaming plan itself (watermark + "
        "tumbling window state) is the engine's, pinned stream==batch "
        "by the oracle hash and tests/test_streaming.py"
    ),
    "stream_cdc_scd2": (
        "three availableNow foreachBatch SCD2 loads executed at build "
        "(checkpoint-continuous micro-batches); returns a checkpointed "
        "current-rows frame — each micro-batch runs the SAME plans the "
        "batch lifecycle's audited queries pin, and the batching-"
        "independence claim is the oracle hash itself"
    ),
    "hybrid_index_rrf": (
        "builds BOTH persisted indexes at query time (BM25 2-batch + "
        "IVF-PQ exact mode); the fused read is the audited "
        "hybrid_search_rrf shape over stored tables — truncate-then-rank "
        "windows on bounded candidate frames, full-outer O(N) fuse"
    ),
    "bm25_index_search": (
        "two persisted-index build commits execute at query time; the "
        "search plan (term-sliced postings scan + broadcast df join) is "
        "the audited bm25_search shape over stored tables — batch-split "
        "invariance and the file-cut contract are pinned in "
        "tests/test_bm25_index.py and the row's own oracle hash"
    ),
    "stream_cdc_full": (
        "availableNow foreachBatch FULL delta loads executed at build "
        "(snapshot micro-batches: deletes, strange-update key-set "
        "fetch, insert); returns a checkpointed current+tombstone "
        "union — the underlying step plans are the audited batch "
        "lifecycle's, geometry-independence pinned by the oracle hash "
        "and tests/test_streaming.py's sweep"
    ),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    extra = sys.argv[2:]
    spark = get_spark("explain_audit")
    qs = entrymod.queries()
    outdir = REPO / "docs" / "plans"
    outdir.mkdir(parents=True, exist_ok=True)
    failures: list[str] = []
    for name in AUDIT + extra:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        (outdir / f"{name}.txt").write_text(plan)
        checks: dict[str, bool] = {}
        checks["no_row_python"] = (
            "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        )
        checks["no_cartesian"] = (
            "CartesianProduct" not in plan or name in CROSS_JOIN_OK
        )
        checks["no_single_partition_window"] = (
            not single_partition_windows(plan)
            or name in SINGLE_PARTITION_WINDOW_OK
        )
        checks["no_unbounded_global_sort"] = (
            not unbounded_global_sorts(plan) or name in GLOBAL_SORT_OK
        )
        if name in PUSHDOWN_EXPECTED:
            checks["pushdown"] = bool(re.search(r"PushedFilters: \[[^\]]", plan))
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        if name in BROADCAST_EXPECTED:
            checks["broadcast"] = bhj >= 1 and smj == 0
        n_scans = len(re.findall(r"ReadSchema: struct<", plan))
        bad = [k for k, v in checks.items() if not v]
        status = "OK  " if not bad else "FAIL"
        if bad:
            failures.append(name)
        print(
            f"{status} {name}: scans={n_scans} bhj={bhj} smj={smj}"
            + (f"  failed: {','.join(bad)}" if bad else "")
        )
    print(f"plans written to {outdir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
