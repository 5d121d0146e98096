# -*- coding: utf-8 -*-
"""Session fixture for the PySpark wrapper e2e tests.

Mirrors the reference's spark_fixture.py (reference:
src/main/python/test/spark_fixture.py:8-22) but locates the library jar
itself: `sbt package` output under target/scala-2.13, overridable via
GRAFT_JAR. JTS ships inside pyspark's own jars directory, so the one
extra jar is the whole classpath delta.
"""

import glob
import os
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.abspath(os.path.join(_HERE, "..", "..", "..", ".."))

# make `from graft.transformer import BroadcastSpatialJoin` resolve
sys.path.insert(0, os.path.join(_REPO, "src", "main", "python"))


def _graft_jar():
    env = os.environ.get("GRAFT_JAR")
    if env:
        return env
    jars = glob.glob(os.path.join(_REPO, "target", "scala-2.13", "*.jar"))
    if not jars:
        raise RuntimeError(
            "graft jar not found under target/scala-2.13 - run `sbt package` "
            "first or set GRAFT_JAR")
    return max(jars, key=os.path.getmtime)


@pytest.fixture(scope="session")
def local_spark(request):
    from pyspark.sql import SparkSession

    jar = _graft_jar()
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    request.addfinalizer(spark.stop)
    return spark
