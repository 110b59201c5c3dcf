import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_gpu_services_spark.session import get_spark
    s = get_spark(app="pytest", cores=8, shuffle_partitions=16)
    yield s
    s.stop()
