from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from gov_ec_pipeline_etl_spark.session import get_spark

    import tempfile

    s = get_spark(
        "engine-tests",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            # keep catalog tables (bucketing tests) out of the repo tree
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_"),
        },
    )
    yield s
    s.stop()
