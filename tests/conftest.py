from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from spark_kinesis_article_analysis_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


#: File-level marker map (see pytest.ini): lets time-boxed runs split
#: the ~27-minute full suite into reproducible chunks with -m instead
#: of hand-maintained --ignore lists.
_MARKS_BY_FILE = {
    "test_differential_fuzz.py": "fuzz",
    "test_properties.py": "fuzz",
    "test_oracle_parity.py": "parity",
    "test_streaming.py": "streaming",
    "test_streaming_dedup_lsh.py": "streaming",
    "test_streaming_sketch.py": "streaming",
    "test_replay_source.py": "streaming",
    "test_kinesis_api.py": "streaming",
}


def pytest_collection_modifyitems(items):
    for item in items:
        mark = _MARKS_BY_FILE.get(Path(item.fspath).name)
        if mark:
            item.add_marker(getattr(pytest.mark, mark))


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()
