import pytest

from trace_aware_reservoir_otel_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="taro-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
