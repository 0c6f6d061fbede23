from __future__ import annotations

import pytest

from metacache_mpi_spark.session import get_spark
from metacache_mpi_spark.sources.pages import write_corpus


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """FIXTURES.md tiny scale (500 pages), generated once per session."""
    out = tmp_path_factory.mktemp("corpus") / "tiny"
    write_corpus(str(out), n_pages=500, seed=42)
    return str(out)
