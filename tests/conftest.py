"""Session-scoped Ray fixture (one init per pytest session)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small(ray_session):
    """Small fixture dir (generated once, cached)."""
    from stac_to_geocore_ray.sources import fixtures
    return fixtures.paths("/root/testdata/sf0.001")


@pytest.fixture()
def tiny_blocks():
    """Force ~hundreds-of-rows blocks so multi-block/boundary paths
    are exercised at sf0.001 (shared by the window/geo op tests)."""
    import ray.data
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024
    yield
    ctx.target_max_block_size = old
