from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from git_etl_spark.session import get_spark

    spark = get_spark(
        app_name="git-etl-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        # static config — must be set at session build (bucketing tests
        # saveAsTable into it)
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="ges-wh-")},
    )
    yield spark
    spark.stop()
