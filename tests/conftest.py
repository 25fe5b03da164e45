from __future__ import annotations

import os
import tempfile

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# isolate the test session's warehouse/metastore (derby is single-process;
# a concurrent CLI run must not contend with pytest)
os.environ.setdefault(
    "SPARK_WAREHOUSE_DIR", tempfile.mkdtemp(prefix="spark_wh_test_")
)

from dbt_on_snowflake_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
