from __future__ import annotations

import pytest

from autoextract.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small shuffle fan-out: test inputs are tiny, task-launch overhead
    # dominates otherwise. Production sizing lives in session.py defaults.
    s = get_spark(app_name="autoextract-tests", parallelism=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
