from __future__ import annotations

import pytest

from autoextract.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="autoextract-tests", parallelism=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
