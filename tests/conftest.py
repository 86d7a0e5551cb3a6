from __future__ import annotations

import pytest

from neo4j_graph_data_science_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gds_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
