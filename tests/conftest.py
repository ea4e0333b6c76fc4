import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_fraud_detection_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cpus=8, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
