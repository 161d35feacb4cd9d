"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
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
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("pdfredact")


def pytest_configure(config):
    os.environ.setdefault("RAY_DEDUP_LOGS", "0")
