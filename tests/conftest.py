import shutil
import tempfile

import pytest

from agr_loader_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("agr-loader-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmproot():
    d = tempfile.mkdtemp(prefix="lake_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
