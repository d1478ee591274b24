import pytest

from anomaly_detection_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("adspark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    """~2k deterministic turns with docids, cached for the session."""
    from anomaly_detection_spark.data import assign_docids, generate_transcripts

    df = assign_docids(generate_transcripts(spark, 2000, seed=42)).persist()
    df.count()
    return df
