"""CLI flag parsing (reference `run.py:104-137` surface).

Regression for the round-4 finding that `--eval_ssim 0` parsed to the
truthy string "0" (boolean flags without an explicit parser), silently
making SSIM un-disableable and `--eval_lpips 0` *enable* LPIPS.
"""
import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "run_cli", os.path.join(os.path.dirname(__file__), "..", "run.py")
)
run_cli = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(run_cli)


def _parse(argv):
    return run_cli.config_parser().parse_args(argv)


def test_bool_flags_disable_with_zero():
    a = _parse(["--eval_ssim", "0", "--eval_lpips", "0",
                "--geometry_searching", "0", "--coarse_training", "False",
                "--fine_training", "false", "--dvgo_init", "0"])
    assert a.eval_ssim is False
    assert a.eval_lpips is False
    assert a.geometry_searching is False
    assert a.coarse_training is False
    assert a.fine_training is False
    assert a.dvgo_init is False


def test_bool_flags_enable_with_one():
    a = _parse(["--eval_ssim", "1", "--eval_lpips", "1",
                "--geometry_searching", "1", "--dvgo_init", "True"])
    assert a.eval_ssim is True
    assert a.eval_lpips is True
    assert a.geometry_searching is True
    assert a.dvgo_init is True


def test_defaults():
    a = _parse([])
    assert a.eval_ssim is True
    assert a.eval_lpips is False
    assert a.geometry_searching and a.coarse_training and a.fine_training
    assert not a.dvgo_init
    assert a.mode == "train"
    assert a.mesh == "auto"
