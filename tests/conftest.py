"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session.

The pure-Python modules (txlog, zorder math, fixtures) never touch Ray;
tests that need a Dataset pipeline request the ``ray_session`` fixture.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


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


@pytest.fixture()
def table_root(tmp_path):
    return str(tmp_path / "table")
