import os

import pytest

os.environ.setdefault("RAY_DISABLE_IMPORT_WARNING", "1")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (task brief requirement)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Small deterministic fixture tables shared across tests."""
    from osmquadtree_depreceated_ray.sources import fixtures

    d = tmp_path_factory.mktemp("fixtures")
    fixtures.write_fixture_dir(str(d), n_pages=1000, seed=42)
    return str(d)
