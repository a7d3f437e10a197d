from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from instagram_data_pipeline_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = build_session(
        app_name="pytest",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp()},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
