from __future__ import annotations

import pytest

from vcf2df_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="vcf2df_spark_tests",
                  shuffle_partitions=8)
    yield s
    s.stop()
