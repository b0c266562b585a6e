import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from char_ner_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")
    spark = build_session("char_ner_spark_tests", master=f"local[{cpus}]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
