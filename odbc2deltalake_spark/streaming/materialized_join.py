"""Incrementally-maintained materialized JOIN view — the delta-join IVM
pattern over two versioned tables, completing the layer
`MaterializedAggregate` opened for rollups (materialized.py).

For an inner equi-join ``A ⋈ B`` over append-only sources, the classic
asymmetric delta rule maintains the view with two batch-sized joins per
refresh instead of a recompute:

    step L:  ΔA ⋈ B@b_applied      (right pinned BELOW its new commits)
    step R:  A@a_head ⋈ ΔB         (left pinned at its already-folded head)

ΔA ⋈ ΔB lands exactly once — in step R, because A@a_head already
contains ΔA while step L deliberately used the OLD B. Each step appends
its rows to the view in ONE commit that also carries the source-version
marker (``extra_commit_fields={"set_props": ...}``), so the marker and
the data are atomic: there is no tailer checkpoint to desynchronize —
the view's own properties ARE the cursor, and a crash at any point
either fully applied a step or left no trace (cf. materialized.py,
which keeps a separate `TableTailer` cursor for its chunked-pacing
needs and therefore needs the idempotent-replay filter this class can
do without).

Scale shape per refresh: two joins each bounded by |Δ| x (matched slice
of the other side). The expensive half — joining a small delta against
a large pinned side — uses the store's bucket pruning when the big side
is hash-bucketized on the join keys (``buckets_for_keys`` →
``read(buckets=...)``): only buckets containing the delta's keys are
scanned, so cost is O(|Δ| + touched buckets), never O(|B|). On a
100 TB fact table bucketized on the join key this is the difference
between an incremental refresh and a nightly rescan. Spark-side, the
delta is the natural broadcast candidate; the pinned side stays a
pruned parquet scan.

Non-append commits (overwrite / merge / restore — including the store's
merge-on-write DML) are not expressible as an append delta; the feed
raises and the view re-baselines with one full join pinned at both
heads, exactly Delta CDF's re-backfill story. Rows-preserving OPTIMIZE
commits contribute zero change rows and flow straight through
(tablestore.read_changes skips them), so nightly compaction never
forces a re-baseline.

**Retraction mode** (``left_key=...``, r8): when the left side declares
a unique key (the fact PK — view rows are then keyed by it, provided
the right side is unique on the join keys, the star-schema dim
contract), source DML and merges fold INCREMENTALLY through the labeled
change feed instead of re-baselining:

  - left changes: post-images join the pinned right and MERGE into the
    view by ``left_key``; keys whose post-image no longer joins (or
    that were deleted) are dropped in the SAME commit
    (``merge_upsert(delete_keys=...)``), so the marker stays atomic
    with both the adds and the retractions.
  - right changes: the affected join keys' fact slice (bucket-pruned)
    re-joins the new right; vanished matches (dim delete, dim key
    moved) delete by the slice's left keys, again one commit.

Without a declared key, multiset retraction on an append-only view
would need weighted rows (the differential-dataflow route) or a
rewrite; the class keeps the re-baseline fallback for that case.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import (
    ChangeFeedTruncatedError,
    VersionedParquetTable,
)


class MaterializedJoin:
    """A maintained ``SELECT on, left_cols, right_cols FROM left JOIN
    right USING (on)``.

    ``on`` names the equi-join key column(s), same names on both sides;
    ``left_cols`` / ``right_cols`` are the non-key columns each side
    contributes (must not collide)."""

    APPLIED_LEFT = "mvj.applied_left"
    APPLIED_RIGHT = "mvj.applied_right"

    def __init__(
        self,
        left: VersionedParquetTable,
        right: VersionedParquetTable,
        root: str | Path,
        on: list[str],
        left_cols: list[str],
        right_cols: list[str],
        left_key: Optional[list[str]] = None,
    ):
        overlap = set(left_cols) & set(right_cols)
        if overlap:
            raise ValueError(f"left/right column collision: {sorted(overlap)}")
        if set(on) & (set(left_cols) | set(right_cols)):
            raise ValueError("join keys are carried implicitly; do not list them")
        if left_key:
            unknown = set(left_key) - set(on) - set(left_cols)
            if unknown:
                raise ValueError(
                    f"left_key columns {sorted(unknown)} are not part of "
                    "the view (must be join keys or left_cols)"
                )
        self.left = left
        self.right = right
        self.view = VersionedParquetTable(root)
        self.on = list(on)
        self.left_cols = list(left_cols)
        self.right_cols = list(right_cols)
        self.left_key = list(left_key) if left_key else None

    # ---------- cursors ----------

    def _applied(self, prop: str) -> int:
        if not self.view.exists():
            return -1
        return int(self.view.get_property(prop) or -1)

    # ---------- plan pieces ----------

    def _project(self, joined: DataFrame) -> DataFrame:
        return joined.select(*self.on, *self.left_cols, *self.right_cols)

    def _side(self, table: VersionedParquetTable, cols: list[str]) -> list[str]:
        return self.on + cols

    def _pinned(
        self,
        spark: SparkSession,
        table: VersionedParquetTable,
        version: int,
        cols: list[str],
        delta_keys: Optional[DataFrame],
    ) -> DataFrame:
        """Read ``table`` at ``version``, bucket-pruned to the delta's
        join keys when the layout allows. The pruning hint reflects the
        HEAD bucket layout, so it is applied only when head == pinned
        version — a re-bucketizing merge between them would make the
        hint unsound for the pinned read (and would re-baseline the view
        on its own side anyway)."""
        buckets = None
        if delta_keys is not None and version == table.version():
            buckets = table.buckets_for_keys(delta_keys, self.on)
        df = table.read(spark, version=version, buckets=buckets)
        return df.select(*self._side(table, cols))

    # ---------- maintenance ----------

    def _baseline(self, spark: SparkSession, va: int, vb: int) -> None:
        joined = self.left.read(spark, version=va).select(
            *self._side(self.left, self.left_cols)
        ).join(
            self.right.read(spark, version=vb).select(
                *self._side(self.right, self.right_cols)
            ),
            on=self.on,
        )
        rows = self._project(joined)
        props = {
            "set_props": {
                self.APPLIED_LEFT: str(va),
                self.APPLIED_RIGHT: str(vb),
            }
        }
        if self.left_key:
            # keep the view bucketized through (re-)baselines so every
            # subsequent fold is a partial merge, never a conversion
            # rewrite; stale keys (a re-baseline after a source
            # overwrite may shrink the row set) delete in the same
            # commit
            stale = None
            if self.view.exists():
                stale = (
                    self.view.read(spark)
                    .select(*self.left_key)
                    .distinct()
                    .join(
                        rows.select(*self.left_key),
                        on=self.left_key,
                        how="left_anti",
                    )
                )
            self.view.merge_upsert(
                spark, rows, key_cols=self.left_key, delete_keys=stale,
                extra_commit_fields=props,
            )
            return
        self.view.write(rows, mode="overwrite", extra_commit_fields=props)

    # ---------- retraction mode (left_key) ----------

    def _cdf_sides(
        self, table: VersionedParquetTable, spark: SparkSession,
        lo: int, hi: int,
    ) -> tuple[DataFrame, DataFrame]:
        """Delta-sized add/retract images, materialized ONCE: the CDF
        synthesis (predicate-filtered replaced-dir reads, merge-slice
        classification joins) feeds 3-4 downstream jobs per fold (bucket
        probes, the view merge, the vanished-key anti-join) — without
        the checkpoint every one of them would re-run the synthesis, and
        the fold's wall time would scale with job COUNT x synthesis
        cost instead of once-per-refresh."""
        cdf = table.read_changes_cdf(spark, lo, hi).localCheckpoint(
            eager=True
        )
        adds = cdf.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop("_change_type", "_commit_version")
        subs = cdf.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).drop("_change_type", "_commit_version")
        return adds, subs

    def _vanished(
        self, spark: SparkSession, keys: DataFrame
    ) -> Optional[DataFrame]:
        """Delete keys for the view merge, or None when nothing
        vanished. Two scans are avoided here: the common fold (append /
        value-update — every changed key still joins) short-circuits on
        the delta-sized candidate set WITHOUT touching the view at all,
        and when keys did vanish the presence check is restricted to
        ones actually in the view — a fact row that never matched a dim
        has no view row, and deleting an absent key would still rewrite
        its bucket."""
        keys = keys.localCheckpoint(eager=True)
        if keys.isEmpty():
            return None
        buckets = self.view.buckets_for_keys(keys, self.left_key)
        view_keys = (
            self.view.read(spark, buckets=buckets)
            if buckets is not None
            else self.view.read(spark)
        ).select(*self.left_key)
        return keys.join(
            view_keys, on=self.left_key, how="left_semi"
        ).localCheckpoint(eager=True)

    def _fold_left(
        self, spark: SparkSession, applied_a: int, head_a: int,
        applied_b: int,
    ) -> None:
        """Fold left-side changes (appends, merges, DML alike) against
        the right pinned BELOW its unfolded commits; adds upsert, keys
        whose post-image vanished or no longer joins delete — one
        commit, marker included."""
        adds, subs = self._cdf_sides(self.left, spark, applied_a, head_a)
        adds = adds.select(*self._side(self.left, self.left_cols))
        pinned_b = self._pinned(
            spark, self.right, applied_b, self.right_cols,
            adds.select(*self.on).distinct(),
        )
        # delta-sized; pin once — merge consumes it for the bucket
        # probe, the write, and the vanished-key anti-join below
        new_rows = self._project(
            adds.join(pinned_b, on=self.on)
        ).localCheckpoint(eager=True)
        cand = (
            adds.select(*self.left_key)
            .unionByName(subs.select(*self.left_key))
            .distinct()
        )
        gone = self._vanished(
            spark,
            cand.join(
                new_rows.select(*self.left_key),
                on=self.left_key, how="left_anti",
            ),
        )
        self.view.merge_upsert(
            spark, new_rows, key_cols=self.left_key, delete_keys=gone,
            extra_commit_fields={
                "set_props": {self.APPLIED_LEFT: str(head_a)}
            },
        )

    def _fold_right(
        self, spark: SparkSession, applied_b: int, head_b: int,
        head_a: int,
    ) -> None:
        """Fold right-side changes: the affected join keys' fact slice
        (bucket-pruned when the fact is bucketized on the join keys)
        re-joins the new right; vanished matches delete by the slice's
        left keys — one commit, marker included."""
        adds, subs = self._cdf_sides(self.right, spark, applied_b, head_b)
        jk = (
            adds.select(*self.on)
            .unionByName(subs.select(*self.on))
            .distinct()
        )
        a_slice = self._pinned(
            spark, self.left, head_a, self.left_cols, jk
        ).join(jk, on=self.on, how="left_semi")
        pinned_b = self._pinned(spark, self.right, head_b, self.right_cols, jk)
        # the affected slice and its re-join feed three jobs (probe,
        # write, anti-join) — pin both once, delta-sized
        a_slice = a_slice.localCheckpoint(eager=True)
        new_rows = self._project(
            a_slice.join(pinned_b, on=self.on)
        ).localCheckpoint(eager=True)
        gone = self._vanished(
            spark,
            a_slice.select(*self.left_key)
            .distinct()
            .join(
                new_rows.select(*self.left_key),
                on=self.left_key, how="left_anti",
            ),
        )
        self.view.merge_upsert(
            spark, new_rows, key_cols=self.left_key, delete_keys=gone,
            extra_commit_fields={
                "set_props": {self.APPLIED_RIGHT: str(head_b)}
            },
        )

    def refresh(self, spark: SparkSession) -> Optional[tuple[int, int]]:
        """Fold both sides' unprocessed commits into the view. Returns
        the new (left, right) applied versions, or None when already
        current. A non-delta range on either side re-baselines once at
        the current heads — unless ``left_key`` retraction mode is on,
        where DML/merge commits fold incrementally and only
        overwrites/truncation re-baseline."""
        head_a = self.left.version()
        head_b = self.right.version()
        applied_a = self._applied(self.APPLIED_LEFT)
        applied_b = self._applied(self.APPLIED_RIGHT)
        if not self.view.exists() or (applied_a == -1 and applied_b == -1):
            self._baseline(spark, head_a, head_b)
            return (head_a, head_b)
        if head_a <= applied_a and head_b <= applied_b:
            return None
        if self.left_key:
            try:
                if head_a > applied_a:
                    self._fold_left(spark, applied_a, head_a, applied_b)
                    applied_a = head_a
                if head_b > applied_b:
                    self._fold_right(spark, applied_b, head_b, applied_a)
                    applied_b = head_b
            except (ValueError, ChangeFeedTruncatedError):
                head_a = self.left.version()
                head_b = self.right.version()
                self._baseline(spark, head_a, head_b)
                return (head_a, head_b)
            return (applied_a, applied_b)
        try:
            # step L: left deltas against the OLD right
            if head_a > applied_a:
                delta_a = self.left.read_changes(
                    spark, applied_a, head_a
                ).drop("_commit_version")
                pinned_b = self._pinned(
                    spark,
                    self.right,
                    applied_b,
                    self.right_cols,
                    delta_a.select(*self.on).distinct(),
                )
                rows = self._project(
                    delta_a.select(*self._side(self.left, self.left_cols)).join(
                        pinned_b, on=self.on
                    )
                )
                self.view.write(
                    rows,
                    mode="append",
                    extra_commit_fields={
                        "set_props": {self.APPLIED_LEFT: str(head_a)}
                    },
                )
                applied_a = head_a
            # step R: the NEW left (ΔA included — counts ΔA ⋈ ΔB once)
            # against right deltas
            if head_b > applied_b:
                delta_b = self.right.read_changes(
                    spark, applied_b, head_b
                ).drop("_commit_version")
                pinned_a = self._pinned(
                    spark,
                    self.left,
                    applied_a,
                    self.left_cols,
                    delta_b.select(*self.on).distinct(),
                )
                rows = self._project(
                    pinned_a.join(
                        delta_b.select(
                            *self._side(self.right, self.right_cols)
                        ),
                        on=self.on,
                    )
                )
                self.view.write(
                    rows,
                    mode="append",
                    extra_commit_fields={
                        "set_props": {self.APPLIED_RIGHT: str(head_b)}
                    },
                )
                applied_b = head_b
        except (ValueError, ChangeFeedTruncatedError):
            # rewrite/DML/truncation on a source: not expressible as a
            # delta — one full re-baseline pinned at the CURRENT heads
            # (re-read: a commit may have landed since; pinning keeps the
            # markers exact)
            head_a = self.left.version()
            head_b = self.right.version()
            self._baseline(spark, head_a, head_b)
            return (head_a, head_b)
        return (applied_a, applied_b)

    # ---------- reads ----------

    def read(self, spark: SparkSession) -> DataFrame:
        return self.view.read(spark)

    def recompute(self, spark: SparkSession) -> DataFrame:
        """The defining query from scratch — the invariant ``read`` must
        equal (as a multiset) after any refresh sequence."""
        return self._project(
            self.left.read(spark)
            .select(*self._side(self.left, self.left_cols))
            .join(
                self.right.read(spark).select(
                    *self._side(self.right, self.right_cols)
                ),
                on=self.on,
            )
        )
