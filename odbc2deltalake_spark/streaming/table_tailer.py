"""Incremental consumption of a versioned table — the commit-log
analogue of a Delta streaming source.

A downstream pipeline (e.g. the training-corpus builder tailing the SCD2
history) should never rescan the table; it should process exactly the
rows each new commit added. `TableTailer` drives that loop over
`VersionedParquetTable.read_changes` with a checkpointed cursor, the
same recovery contract as the engine's `foreachBatch` driver
(streaming/driver.py): the cursor advances only AFTER the batch function
returns, so a crash replays the last batch — at-least-once delivery,
exactly-once effect when the consumer keys its writes by
``_commit_version`` (idempotent re-apply), which is also how Spark's own
foreachBatch achieves exactly-once.

Scale: each call moves only the NEW commits' files (change-set-sized,
never table-sized); the cursor is one tiny JSON on the table's own
storage backend, so the tailer fails over to any other host with the
checkpoint intact.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable


class TableTailer:
    def __init__(
        self,
        table: VersionedParquetTable,
        checkpoint_name: str = "_tail_checkpoint.json",
    ):
        self.table = table
        self._ckpt = table.backend.join(table._root_str, checkpoint_name)

    def last_processed(self) -> int:
        """Version the consumer has fully processed; -1 before the first
        batch (the next batch then starts at version 0).

        Only a genuinely ABSENT checkpoint means "start over" — a
        transient read error or corrupt content must raise, not reset:
        a silent -1 would replay the whole table into the consumer (and
        then overwrite the checkpoint), exactly the full-history
        double-apply the cursor exists to prevent."""
        if not self.table.backend.exists(self._ckpt):
            return -1
        text = self.table.backend.read_text(self._ckpt)
        return int(json.loads(text)["version"])

    def _advance(self, version: int) -> None:
        self.table.backend.write_text_atomic(
            self._ckpt, json.dumps({"version": version})
        )

    def start_at_timestamp(self, ts) -> int:
        """Position a FRESH tailer so the first batch delivers commits
        strictly AFTER the newest version committed at or before ``ts``
        (epoch seconds or datetime) — "tail from last night's load"
        without knowing version numbers. Refused once a checkpoint
        exists (same no-rewind rule as :meth:`skip_to`; moving an
        established cursor forward is `skip_to`). Returns the cursor
        version set."""
        if self.table.backend.exists(self._ckpt):
            raise ValueError(
                "start_at_timestamp on an established cursor — use "
                "skip_to(version) to move forward explicitly"
            )
        v = self.table.version_at_timestamp(ts)
        self._advance(v)
        return v

    def skip_to(self, version: int) -> None:
        """Move the cursor forward without delivering — for consumers
        that handled a non-delta range out of band (e.g. a full
        recompute after a source rewrite). Rewinding is refused: a
        backward cursor replays history into a consumer that has already
        folded it in."""
        if version < self.last_processed():
            raise ValueError(
                f"skip_to({version}) would rewind past "
                f"{self.last_processed()}"
            )
        self._advance(version)

    def process_available(
        self,
        spark: SparkSession,
        fn: Callable[[DataFrame, int, int], Any],
        on_rewrite: str = "raise",
        max_commits: Optional[int] = None,
    ) -> Optional[tuple[int, int]]:
        """Deliver all unprocessed commits as ONE batch:
        ``fn(changes_df, from_version, to_version)`` where ``changes_df``
        carries ``_commit_version``. Returns the processed (from, to]
        range, or None when already caught up.

        ``max_commits`` caps how many commits one delivery covers — the
        admission control for a tailer that fell far behind (500 missed
        loads must not become one 500-load mega-batch that overwhelms
        the consumer or the cluster). Each call advances the cursor by
        at most that many commits, exactly-once per chunk via the same
        cursor contract; loop ``process_available`` (or use
        :meth:`drain`) to catch up. A re-baseline snapshot ignores the
        cap — it is one table-sized read regardless of lag, which is the
        point of re-baselining.

        ``on_rewrite`` controls what happens when the range is not
        deliverable as a delta — it contains an overwrite/merge/restore
        commit, or the cursor lags past the vacuum retention window and
        a selected commit's data dir is gone
        (``ChangeFeedTruncatedError``, raised at plan time by
        ``read_changes``): ``"raise"`` propagates the named error;
        ``"snapshot"`` re-baselines — fn receives the FULL current
        snapshot (every row tagged with the latest ``_commit_version``)
        and the cursor jumps to it, mirroring Delta CDF's re-backfill
        story. Both recover identically because a consumer that keys by
        ``_commit_version`` treats the snapshot as a fresh baseline."""
        last = self.last_processed()
        to_v = self.table.version()
        if to_v <= last:
            return None
        if max_commits is not None:
            if max_commits < 1:
                raise ValueError(f"max_commits must be >= 1, got {max_commits}")
            to_v = min(to_v, last + max_commits)
        try:
            batch = self.table.read_changes(spark, last, to_v)
        except ValueError:
            if on_rewrite != "snapshot":
                raise
            to_v = self.table.version()  # snapshot covers the full head
            # pin the read at to_v: an unpinned latest-snapshot read would
            # include a commit landing between version() and read(), while
            # the cursor stops at to_v — that commit would be redelivered
            # and double-folded on the next drain (materialized.py pins
            # its recovery read for the same reason)
            batch = self.table.read(spark, version=to_v).withColumn(
                "_commit_version", F.lit(to_v).cast("long")
            )
        fn(batch, last, to_v)
        self._advance(to_v)
        return (last, to_v)

    def drain(
        self,
        spark: SparkSession,
        fn: Callable[[DataFrame, int, int], Any],
        on_rewrite: str = "raise",
        max_commits: Optional[int] = None,
    ) -> list[tuple[int, int]]:
        """Catch up to the head in bounded chunks: repeat
        ``process_available(max_commits=...)`` until None. Returns the
        processed ranges. With the default ``max_commits=None`` this is
        at most two rounds (one delivery + the caught-up check); with a
        cap it is the backlog paced into ``ceil(lag / max_commits)``
        deliveries, each checkpointed — a crash mid-drain loses at most
        one chunk's work to replay."""
        out: list[tuple[int, int]] = []
        while True:
            rng = self.process_available(
                spark, fn, on_rewrite=on_rewrite, max_commits=max_commits
            )
            if rng is None:
                return out
            out.append(rng)
