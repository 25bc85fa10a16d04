import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from odbc2deltalake_spark.session import get_spark  # noqa: E402

# Data-driven slow marking (VERDICT r14 #2): tests/slow_manifest.json holds
# the node-ids whose measured call time exceeded the cut (see
# tools/gen_slow_manifest.py). pytest.ini's `-m "not slow"` default keeps
# the driver's `pytest tests/` run under its VERIFY budget; `-m slow` /
# `-m ""` run the deferred set. Fail-open by design: a node-id that
# drifts (rename, new parametrization) simply stays in the fast set —
# the suite gets slower, never loses a test.
_SLOW_MANIFEST = REPO / "tests" / "slow_manifest.json"
try:
    _SLOW_IDS = set(json.loads(_SLOW_MANIFEST.read_text())["slow"])
except (OSError, ValueError, KeyError):
    _SLOW_IDS = set()


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid.replace("\\", "/")
        if not nid.startswith("tests/"):
            nid = "tests/" + nid.split("tests/")[-1]
        if nid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def dest(tmp_path):
    return tmp_path / "dest"
