import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
TESTS_DIR = os.path.join(REPO_ROOT, "tests")
if TESTS_DIR not in sys.path:
    sys.path.insert(0, TESTS_DIR)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from parsee_pdf_reader_spark.session import get_spark

    s = get_spark("parsee-spark-tests", master="local[4]",
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def reference():
    """The actual reference engine, imported under fake native deps."""
    import refshim

    if not os.path.isdir(refshim.REFERENCE_PATH):
        pytest.skip("reference checkout not available")
    return refshim.install_reference()
