import pytest

from off_topic_memento_toolkit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    session = get_spark(app_name="otmt-spark-tests", master="local[4]",
                        shuffle_partitions=4)
    yield session
    session.stop()
