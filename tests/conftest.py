import pytest

from edsnlp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="edsnlp-spark-tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.01"
