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


@pytest.mark.parametrize("mod,req", [
    ("inference", ["--checkpoint", "x"]),
    ("metric", ["--checkpoint", "x", "--classifier_checkpoint", "y"]),
    ("sample_efficiency", ["--checkpoint", "x"]),
    ("dr_robustness", ["--checkpoint", "x"]),
    ("tabular_inference", ["--checkpoint", "x"]),
    ("tabular_inference_tvae", ["--checkpoint", "x"]),
    ("generate_data", ["--out", "x"]),
])
def test_eval_clis_accept_platform(mod, req):
    """Every device-touching eval/analysis CLI takes --platform (the
    backend override used for CPU drives while the chip is busy/down);
    parsing '' must be a no-op."""
    import importlib
    m = importlib.import_module(f"cdgvae_tpu.cli.{mod}")
    args = m.get_args(argv=req + ["--platform", ""])
    assert args.platform == ""


def test_arg_as_bool_rejects_garbage():
    assert arg_as_bool("True") is True
    assert arg_as_bool("0") is False
    with pytest.raises(argparse.ArgumentTypeError):
        arg_as_bool("maybe")
