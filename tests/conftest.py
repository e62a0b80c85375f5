import os
import sys

import pytest
import ray

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray workers resolve gush_ray from PYTHONPATH at spawn — a driver-side
# sys.path insert is not enough when pytest runs from a foreign cwd
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    if owns:  # never tear down a session this fixture does not own
        ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
