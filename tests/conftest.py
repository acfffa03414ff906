from __future__ import annotations

import pytest

from bigdata_event_stream_detection_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("besd-tests", cores=8, shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s


@pytest.fixture(scope="session")
def tiny_sequences(spark):
    """2k-doc deterministic planted-HMM fixture (FIXTURES.md F1)."""
    from bigdata_event_stream_detection_spark.sources.synthetic import (
        generate_sequences,
    )

    df = generate_sequences(spark, 2000, partitions=8)
    df.cache()
    df.count()
    return df
