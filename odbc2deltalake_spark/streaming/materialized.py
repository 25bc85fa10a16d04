"""Incrementally-maintained materialized aggregate view — the lakehouse
IVM (incremental view maintenance) pattern over the engine's versioned
tables: a rollup that stays current by folding in each source commit's
delta instead of rescanning the source.

Composition: `TableTailer` delivers each source commit exactly once;
the view folds the batch's PARTIAL aggregate into its stored state and
commits the new state together with an ``mv.applied_to`` watermark IN
THE SAME COMMIT (``extra_commit_fields={"set_props": ...}`` — the
commit-log replay applies ``set_props`` from any commit, so state and
marker are atomic). Exactly-once effect follows the standard two-layer
contract (the same one Delta's ``txnAppId``/``txnVersion`` sink
implements): the tailer gives at-least-once delivery, the atomic marker
makes re-application idempotent — a replayed batch whose ``to_version``
is already folded in is skipped.

Only DECOMPOSABLE aggregates are supported (count / sum / avg / min /
max): each folds by combining partial states, which is what makes
maintenance O(batch + |view|) instead of O(source). min/max are safe
here because the change feed is append-only (deltas never retract); a
source REWRITE is not expressible as a delta at all, so it triggers a
full recompute (the same re-backfill story as Delta CDF).

Scale shape per refresh: one batch-sized aggregation (map-side combine
collapses each partition to <= |touched groups|), one union+re-aggregate
against the |view|-sized state, one view overwrite. The view is
output-sized — a daily rollup of a 100 TB corpus is thousands of rows —
so the overwrite is the cheap, atomic choice; a high-cardinality view
would swap the overwrite for ``merge_upsert`` on the group keys at the
cost of threading the marker through the merge commit.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2deltalake_spark.streaming.table_tailer import TableTailer
from odbc2deltalake_spark.tablestore import VersionedParquetTable

_KINDS = ("count", "sum", "avg", "min", "max")


class MaterializedAggregate:
    """A maintained ``SELECT group_cols, aggs FROM source GROUP BY
    group_cols``.

    ``aggs`` maps output column -> (kind, source_col); kind "count"
    ignores the source column (pass None). Internal state stores the
    decomposed counters (sum+count for avg), finalized on ``read``.
    """

    APPLIED_PROP = "mv.applied_to"

    def __init__(
        self,
        source: VersionedParquetTable,
        root: str | Path,
        group_cols: list[str],
        aggs: dict[str, tuple[str, Optional[str]]],
        strategy: str = "overwrite",
    ):
        """``strategy`` picks the state-update physical plan:

        - ``"overwrite"`` (default): rewrite the whole view per refresh —
          right when the view is output-sized (a rollup of a 100 TB
          corpus is thousands of rows), and trivially atomic.
        - ``"merge"``: fold ONLY the touched groups and merge_upsert them
          on the group keys — O(touched + bucket rewrite) per refresh,
          the high-cardinality-view path (e.g. per-user state). The
          exactly-once marker rides the merge commit via
          ``extra_commit_fields``. Requires non-null group keys (MERGE
          matches on equality; SQL null never equals null). A source
          rewrite still re-baselines with one overwrite, so the next
          merge re-bucketizes once.
        """
        for out, (kind, col) in aggs.items():
            if kind not in _KINDS:
                raise ValueError(f"{out}: unsupported aggregate {kind!r}")
            if kind != "count" and col is None:
                raise ValueError(f"{out}: {kind} needs a source column")
        if strategy not in ("overwrite", "merge"):
            raise ValueError(f"unknown strategy {strategy!r}")
        self.source = source
        self.view = VersionedParquetTable(root)
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)
        self.strategy = strategy
        # distinct cursor per view so several views can tail one source:
        # keyed by the FULL root path (hashed), not the basename — two
        # views named .../a/view and .../b/view must not share a cursor
        import hashlib

        root_tag = hashlib.md5(str(Path(root)).encode()).hexdigest()[:12]
        self.tailer = TableTailer(
            source,
            checkpoint_name=(
                f"_mv_{Path(str(root)).name}_{root_tag}_cursor.json"
            ),
        )

    # ---------- state algebra ----------

    def _partial(self, df: DataFrame) -> DataFrame:
        """Raw rows -> decomposed state rows (one per touched group)."""
        exprs = []
        for out, (kind, col) in self.aggs.items():
            if kind == "count":
                exprs.append(F.count(F.lit(1)).alias(f"__c_{out}"))
            elif kind == "sum":
                exprs.append(F.sum(col).alias(f"__s_{out}"))
            elif kind == "avg":
                exprs.append(F.sum(col).alias(f"__as_{out}"))
                exprs.append(F.count(col).alias(f"__ac_{out}"))
            elif kind == "min":
                exprs.append(F.min(col).alias(f"__mn_{out}"))
            elif kind == "max":
                exprs.append(F.max(col).alias(f"__mx_{out}"))
        return df.groupBy(*self.group_cols).agg(*exprs)

    def _combine(self, state: DataFrame, partial: DataFrame) -> DataFrame:
        """Fold two state frames: counters add, extrema re-extremize.
        union + re-aggregate keeps one plan shape for 2..N-way folds and
        lets the map-side combine do the heavy lifting."""
        exprs = []
        for out, (kind, _col) in self.aggs.items():
            if kind == "count":
                exprs.append(F.sum(f"__c_{out}").alias(f"__c_{out}"))
            elif kind == "sum":
                exprs.append(F.sum(f"__s_{out}").alias(f"__s_{out}"))
            elif kind == "avg":
                exprs.append(F.sum(f"__as_{out}").alias(f"__as_{out}"))
                exprs.append(F.sum(f"__ac_{out}").alias(f"__ac_{out}"))
            elif kind == "min":
                exprs.append(F.min(f"__mn_{out}").alias(f"__mn_{out}"))
            elif kind == "max":
                exprs.append(F.max(f"__mx_{out}").alias(f"__mx_{out}"))
        return (
            state.unionByName(partial).groupBy(*self.group_cols).agg(*exprs)
        )

    # ---------- maintenance ----------

    def applied_to(self) -> int:
        if not self.view.exists():
            return -1
        return int(self.view.get_property(self.APPLIED_PROP) or -1)

    def _write_state(self, state: DataFrame, to_v: int) -> None:
        self.view.write(
            state,
            mode="overwrite",
            extra_commit_fields={
                "set_props": {self.APPLIED_PROP: str(to_v)}
            },
        )

    def _apply(self, batch: DataFrame, from_v: int, to_v: int) -> None:
        applied = self.applied_to()
        if to_v <= applied:
            # replayed delivery (crash landed between the view commit and
            # the tailer checkpoint write) — already folded in, skip
            return
        if applied > from_v:
            # PARTIAL replay: the delivered range (from_v, to_v] starts
            # before the marker (crash after folding (from_v, applied],
            # then new commits landed). Fold only the unapplied tail —
            # re-folding the applied prefix would double its counters.
            batch = batch.filter(F.col("_commit_version") > applied)
        spark = batch.sparkSession
        partial = self._partial(batch.drop("_commit_version"))
        # first-write is decided by the MARKER, not from_v: a rewound
        # cursor redelivers from -1, but if the view already holds
        # applied state the (filtered) tail must COMBINE with it —
        # overwriting would drop every previously folded commit
        if applied == -1 and self.view.exists():
            # view holds state but the exactly-once marker is gone
            # (cleared property / out-of-band creation): neither branch
            # is safe — first-write discards the folded counters,
            # combine double-folds whatever they already contain
            raise RuntimeError(
                f"materialized view at {self.view._root_str} exists but "
                f"carries no {self.APPLIED_PROP} marker — refusing to "
                "fold (would discard or double-count existing state); "
                "delete the view or restore the marker, then refresh"
            )
        if applied == -1:
            if self.strategy == "merge":
                # first state lands through merge_upsert so the view is
                # bucketized from commit 0 (marker rides the same commit)
                self.view.merge_upsert(
                    spark,
                    partial,
                    key_cols=self.group_cols,
                    extra_commit_fields={
                        "set_props": {self.APPLIED_PROP: str(to_v)}
                    },
                )
            else:
                self._write_state(partial, to_v)
            return
        if self.strategy == "merge":
            # fold only the TOUCHED groups, then merge them on the keys —
            # the view rewrite is bounded by touched buckets, not |view|.
            # buckets_for_keys prunes the old-state read to those same
            # buckets (None => table not bucketized yet => full read once)
            touched_keys = partial.select(*self.group_cols).distinct()
            bl = self.view.buckets_for_keys(touched_keys, self.group_cols)
            old = self.view.read(spark, buckets=bl) if bl is not None else (
                self.view.read(spark)
            )
            touched_old = old.join(
                touched_keys, on=self.group_cols, how="left_semi"
            )
            combined = self._combine(touched_old, partial)
            self.view.merge_upsert(
                spark,
                combined,
                key_cols=self.group_cols,
                extra_commit_fields={
                    "set_props": {self.APPLIED_PROP: str(to_v)}
                },
            )
            return
        self._write_state(self._combine(self.view.read(spark), partial), to_v)

    def refresh(
        self, spark: SparkSession, max_commits: Optional[int] = None
    ) -> Optional[tuple[int, int]]:
        """Fold all unprocessed source commits into the view. Returns the
        processed (from, to] range, or None when already current. A
        range not readable as a delta — a source rewrite, or a cursor
        that lagged past the vacuum retention window
        (``ChangeFeedTruncatedError``) — falls back to one full
        recompute pinned at the head version.

        ``max_commits`` paces a far-behind refresh into bounded chunks
        (the tailer's admission control): each chunk folds and commits
        with its own marker, so a crash mid-catch-up loses at most one
        chunk to the idempotent replay. Returns the overall covered
        range (first from, last to)."""
        delivered = False
        ranges: list[tuple[int, int]] = []

        def fn(batch: DataFrame, from_v: int, to_v: int) -> None:
            nonlocal delivered
            delivered = True
            self._apply(batch, from_v, to_v)

        try:
            if max_commits is None:
                return self.tailer.process_available(spark, fn)
            # chunked drain with the delivered-flag reset PER CHUNK: a
            # later chunk hitting a rewrite must re-baseline even though
            # earlier chunks folded fine — only a ValueError raised
            # inside the CURRENT chunk's fold means corruption
            while True:
                delivered = False
                rng = self.tailer.process_available(
                    spark, fn, max_commits=max_commits
                )
                if rng is None:
                    break
                ranges.append(rng)
            if not ranges:
                return None
            return (ranges[0][0], ranges[-1][1])
        except ValueError:
            if delivered:
                # the ValueError came from the fold itself, not from
                # read_changes — propagate; swallowing it as "rewrite"
                # would mask real corruption with a silent recompute
                raise
            # overall covered range includes chunks folded before the
            # recovery (they advanced the cursor, so last_processed is
            # their high-water mark only when ranges is empty)
            last = ranges[0][0] if ranges else self.tailer.last_processed()
            to_v = self.source.version()
            if self._fold_cdf(spark, to_v):
                # retraction fold succeeded: DML handled incrementally,
                # no table-sized recompute
                return (last, to_v)
            # recompute AT to_v: reading the unpinned latest snapshot
            # would fold a concurrently-landed commit while leaving the
            # cursor behind it — that commit would then fold twice
            self._write_state(
                self._partial(self.source.read(spark, version=to_v)), to_v
            )
            self.tailer.skip_to(to_v)
            return (last, to_v)

    # A fold scans ~fold_rows (two map-side partial aggregations, no
    # join); one recompute scans table_rows once. Past this ratio the
    # recompute wins — e.g. a merge batch whose keys hash into every
    # bucket makes fold_rows ~ 2x table_rows.
    FOLD_COST_FACTOR = 0.8

    def _fold_cdf(self, spark: SparkSession, to_v: int) -> bool:
        """Try folding the blocked range through the coarse retraction
        feed (``read_changes_fold``): adds ADD, subs SUBTRACT (negated
        partials), so a source DELETE/UPDATE/MERGE maintains the view in
        O(change set) instead of a table-sized recompute — with no
        classification join: a merge's unchanged rows appear in both
        adds and subs and cancel arithmetically. Returns False — caller
        re-baselines — when the aggregates are not retractable (min/max
        cannot un-take an extremum), when no ``count`` aggregate tracks
        group liveness (a sum-only view cannot distinguish an emptied
        group from sum==0, and recompute drops emptied groups), when the
        view holds no prior state, when the range is not
        fold-representable (overwrite, Column-SET update, truncation),
        or when the feed's metadata cost estimate says one recompute
        scan is cheaper than the fold's."""
        kinds = {kind for kind, _ in self.aggs.values()}
        if not kinds <= {"count", "sum", "avg"}:
            return False
        count_cols = [
            f"__c_{out}"
            for out, (kind, _c) in self.aggs.items()
            if kind == "count"
        ]
        if not count_cols:
            return False
        applied = self.applied_to()
        if applied == -1:
            return False
        try:
            adds, subs, cost = self.source.read_changes_fold(
                spark, applied, to_v
            )
        except ValueError:
            return False
        except AttributeError:  # source store without a fold feed
            return False
        fr, tr = cost.get("fold_rows"), cost.get("table_rows")
        if fr and tr and fr > self.FOLD_COST_FACTOR * tr:
            return False  # metadata says the recompute scan is cheaper
        neg = self._partial(subs)
        neg = neg.select(
            *self.group_cols,
            *[
                (-F.col(c)).alias(c)
                for c in neg.columns
                if c not in self.group_cols
            ],
        )
        state = self._combine(
            self.view.read(spark),
            self._partial(adds).unionByName(neg),
        ).filter(F.col(count_cols[0]) > 0)
        self._write_state(state.localCheckpoint(eager=True), to_v)
        self.tailer.skip_to(to_v)
        return True

    # ---------- reads ----------

    def read(self, spark: SparkSession) -> DataFrame:
        """Finalized view: avg derived from its sum/count state."""
        cols = [F.col(c) for c in self.group_cols]
        for out, (kind, _col) in self.aggs.items():
            if kind == "count":
                cols.append(F.col(f"__c_{out}").alias(out))
            elif kind == "sum":
                cols.append(F.col(f"__s_{out}").alias(out))
            elif kind == "avg":
                cols.append(
                    (F.col(f"__as_{out}") / F.col(f"__ac_{out}")).alias(out)
                )
            elif kind == "min":
                cols.append(F.col(f"__mn_{out}").alias(out))
            elif kind == "max":
                cols.append(F.col(f"__mx_{out}").alias(out))
        return self.view.read(spark).select(*cols)

    def recompute(self, spark: SparkSession) -> DataFrame:
        """The view's defining query, evaluated from scratch on the
        current source — the invariant `read` must equal after any
        refresh sequence (tests pin this)."""
        exprs = []
        for out, (kind, col) in self.aggs.items():
            fn = {
                "count": lambda c: F.count(F.lit(1)),
                "sum": F.sum,
                "avg": F.avg,
                "min": F.min,
                "max": F.max,
            }[kind]
            exprs.append(fn(col).alias(out))
        return self.source.read(spark).groupBy(*self.group_cols).agg(*exprs)


class MaterializedDistinct:
    """Exact ``COUNT(DISTINCT col)`` (plus non-null occurrence count)
    per group, incrementally maintained — the classic two-level IVM
    decomposition. COUNT(DISTINCT) is not directly retractable (a
    delete may or may not remove the group's LAST occurrence of a
    value), so the state is an inner retractable
    ``(group_cols, distinct_col) -> occurrences`` view
    (:class:`MaterializedAggregate`, plain count arithmetic under
    adds/retracts, emptied rows dropped by its liveness filter) and the
    outer answer is just the inner view's per-group live row count —
    computed on ``read`` over the VIEW-SIZED state, never the source.

    Every source mutation the inner view folds incrementally therefore
    maintains the distinct count incrementally too: a merge re-keying a
    value retracts the old (group, value) row and adds the new one; a
    DELETE that removes a value's last occurrence drops the inner row
    and the distinct count falls by exactly one.

    SQL semantics: NULL values never count (``COUNT(DISTINCT col)`` and
    ``COUNT(col)`` both ignore NULLs) — tracked in the inner state but
    filtered at read. The ``strategy="merge"`` inner path inherits
    MaterializedAggregate's non-null GROUP KEY requirement, which for
    this view includes the distinct column; keep the default overwrite
    strategy when the distinct column is nullable.

    Scale: inner state size = number of live (group, value) pairs (the
    same state any exact streaming COUNT DISTINCT keeps); per refresh
    the fold touches O(change set) rows, and the outer aggregation is a
    map-side-combined count over the state. For cardinalities where
    even that state is too big, the approx sketches
    (approx_user_cardinality) are the documented fallback.
    """

    def __init__(
        self,
        source: VersionedParquetTable,
        root: str | Path,
        group_cols: list[str],
        distinct_col: str,
        strategy: str = "overwrite",
    ):
        if distinct_col in group_cols:
            raise ValueError("distinct_col cannot also be a group col")
        self.group_cols = list(group_cols)
        self.distinct_col = distinct_col
        self.inner = MaterializedAggregate(
            source,
            root,
            group_cols=list(group_cols) + [distinct_col],
            aggs={"__occ": ("count", None)},
            strategy=strategy,
        )

    @property
    def source(self) -> VersionedParquetTable:
        return self.inner.source

    def refresh(
        self, spark: SparkSession, max_commits: Optional[int] = None
    ) -> Optional[tuple[int, int]]:
        return self.inner.refresh(spark, max_commits=max_commits)

    def applied_to(self) -> int:
        return self.inner.applied_to()

    def read(self, spark: SparkSession) -> DataFrame:
        # NULL values are excluded from the counts but must not drop
        # the GROUP: an all-null group still has rows, and SQL GROUP BY
        # keeps it with COUNT(DISTINCT col) = 0
        nn = F.col(self.distinct_col).isNotNull()
        return self.inner.read(spark).groupBy(*self.group_cols).agg(
            F.sum(F.when(nn, 1).otherwise(0)).cast("long").alias(
                "n_distinct"
            ),
            F.sum(F.when(nn, F.col("__occ")).otherwise(0))
            .cast("long")
            .alias("n_rows"),
        )

    def recompute(self, spark: SparkSession) -> DataFrame:
        """The defining query from scratch — the invariant ``read``
        must equal after any refresh sequence."""
        return (
            self.source.read(spark)
            .groupBy(*self.group_cols)
            .agg(
                F.countDistinct(self.distinct_col).alias("n_distinct"),
                F.count(self.distinct_col).alias("n_rows"),
            )
        )
