import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from earth_data_kit_spark.session import get_spark

    s = get_spark(app_name="edk-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
