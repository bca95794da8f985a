import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlis2osm_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="rlis2osm_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """Small deterministic synthetic RLIS dataset shared across tests."""
    from rlis2osm_spark.datagen import ensure_dataset

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                     ".synth", "test_small")
    ensure_dataset(os.path.abspath(d), n_streets=300, n_trails=80)
    return os.path.abspath(d)
