import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from goffish_v3_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="goffish-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def repos60(spark):
    from goffish_v3_spark.sources.synthetic import generate_repos

    df = generate_repos(spark, n_repos=3, files_per_repo=20, seed=42).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="session")
def graph60(spark, repos60):
    from goffish_v3_spark.sources.ingest import ingest

    g = ingest(repos60)
    g.vertices.persist().count()
    g.edges.persist().count()
    yield g
    g.vertices.unpersist()
    g.edges.unpersist()
