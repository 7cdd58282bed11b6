import os
from pathlib import Path

import pytest

# Same quiet Ray Data logging config bench.py uses: worker-side INFO chatter
# (e.g. the ray schema-hash "unhashable type 'dict'" line from dict-metadata
# batches) goes to the session file handler, not the pytest console. Must be
# in the environment BEFORE ray.init so worker processes inherit it.
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    str(Path(__file__).resolve().parent.parent / "ray_data_logging_quiet.yaml"),
)


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-subprocess end-to-end tests (~1 min)"
    )
