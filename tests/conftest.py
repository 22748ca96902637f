import pytest

from pac_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[2]", shuffle_partitions=4)
    yield s
    s.stop()
