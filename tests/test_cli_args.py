"""Fast unit tests for the shared CLI argument hooks (cli/common.py)."""
import argparse

import jax
import pytest

from cdgvae_tpu.cli.common import _platform_arg, arg_as_bool


def test_platform_arg_empty_is_noop():
    before = jax.config.jax_platforms
    assert _platform_arg("") == ""
    assert jax.config.jax_platforms == before


def test_platform_arg_sets_backend_before_device_touch():
    # the suite runs with the cpu backend forced (conftest), so re-applying
    # "cpu" through the hook is observable yet side-effect free
    assert _platform_arg(" CPU ") == "cpu"
    assert jax.config.jax_platforms == "cpu"
    assert jax.default_backend() == "cpu"


def test_arg_as_bool_rejects_garbage():
    assert arg_as_bool("True") is True
    assert arg_as_bool("0") is False
    with pytest.raises(argparse.ArgumentTypeError):
        arg_as_bool("maybe")
