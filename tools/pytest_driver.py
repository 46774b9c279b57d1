"""spark-submit entry point that runs the test suite (input_hint
contract: the suite passes under ``python -m pytest -x -q`` when
launched with ``spark-submit --py-files``).  Usage:

    python tools/make_pyfiles_zip.py          # -> /tmp/dqc_spark.zip
    spark-submit --driver-memory 8g --py-files /tmp/dqc_spark.zip \
        tools/pytest_driver.py

(--driver-memory matters: spark-submit launches the driver JVM before
any SparkSession config runs, so the in-code spark.driver.memory is
ignored and the 1g default OOMs on the cached-intermediate suites.)
"""

import os
import sys

import pytest

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(repo)
sys.path.insert(0, repo)
sys.exit(pytest.main(["-x", "-q", "tests/"]))
