"""Per-step wall-clock itemization of one CDC delta load (VERDICT r6
"cdc_delta_load ... or its added cost itemized per stage").

Replays bench.py's cdc_delta_load scenario at $SPARK_GRAFT_SF_DIR and
times the interval between the engine's own step-boundary log records,
printing one line per step. Run on an idle machine.

    python tools/profile_delta_load.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from odbc2deltalake_spark import (
    ColInfo,
    DataFrameSource,
    WriteConfig,
    write_db_to_delta,
)
from odbc2deltalake_spark.queries.registry import load_table
from odbc2deltalake_spark.session import get_spark


class StepTimer:
    """Wraps DeltaLogger.info (the engine's own step-boundary marks, a
    pylist sink rather than python logging) with perf_counter stamps."""

    def __init__(self):
        self.marks: list[tuple[float, str]] = []

    def install(self):
        from odbc2deltalake_spark.plans.destination import DeltaLogger

        orig = DeltaLogger.info
        timer = self

        def wrapped(logger_self, message, **kw):
            timer.marks.append((time.perf_counter(), message))
            return orig(logger_self, message, **kw)

        DeltaLogger.info = wrapped
        return lambda: setattr(DeltaLogger, "info", orig)

    def report(self, t0: float, t_end: float) -> list[tuple[str, float]]:
        # each mark is emitted BEFORE its step runs: charge the gap to
        # the PRECEDING mark's step
        out = []
        prev_t, prev_m = t0, "(setup before step 1)"
        for t, m in self.marks:
            out.append((prev_m, t - prev_t))
            prev_t, prev_m = t, m
        out.append((prev_m, t_end - prev_t))
        return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_delta_load")
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
    dest = tempfile.mkdtemp(prefix="prof_cdc_")
    handler = StepTimer()
    restore = handler.install()
    try:
        write_db_to_delta(spark, src, dest, cfg)  # full load (untimed detail)
        upd = ev.filter(F.col("event_id") % 100 == 0).withColumn(
            "rv", F.col("rv") + 10_000_000
        )
        base = ev.filter(F.col("event_id") % 100 != 0)
        new = ev.limit(1000).select(
            (F.col("event_id") + 20_000_000).alias("event_id"),
            "ts", "user_id", "event_type", "value",
            (F.col("rv") + 20_000_000).alias("rv"),
        )
        src.set_df(base.unionByName(upd).unionByName(new))
        # two profiled rounds on fresh destinations: round 1 carries JIT/
        # session warm-up, round 2 is the steady-state number (bench.py
        # reports the min of two for the same reason)
        for rnd in (1, 2):
            dest2 = tempfile.mkdtemp(prefix="prof_cdc_r_")
            try:
                src.set_df(ev)
                write_db_to_delta(spark, src, dest2, cfg)
                src.set_df(base.unionByName(upd).unionByName(new))
                handler.marks.clear()
                t0 = time.perf_counter()
                write_db_to_delta(spark, src, dest2, cfg)
                t_end = time.perf_counter()
                print(f"round {rnd} cdc_delta_load total: {t_end - t0:.2f}s")
                for msg, dt in handler.report(t0, t_end):
                    print(f"  {dt:6.2f}s  after: {msg[:90]}")
            finally:
                shutil.rmtree(dest2, ignore_errors=True)
    finally:
        restore()
        shutil.rmtree(dest, ignore_errors=True)


if __name__ == "__main__":
    main()
