import pytest

from helpers_train import tiny_config  # noqa: F401


@pytest.fixture
def tiny_cfg():
    return tiny_config()
