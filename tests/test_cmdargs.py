"""Typed argparse extensions (mirrors reference test/unit/test_cmdargs.py)."""

import argparse

import numpy as np
import pytest

from taiyaki_tpu.utils import cmdargs


def make_parser():
    return argparse.ArgumentParser()


def test_maybe_none_and_value():
    t = cmdargs.Maybe(int)
    assert t("None") is None
    assert t("7") == 7


def test_positive_rejects_nonpositive():
    t = cmdargs.Positive(float)
    assert t("0.5") == 0.5
    with pytest.raises(argparse.ArgumentTypeError):
        t("0")
    with pytest.raises(argparse.ArgumentTypeError):
        t("-1")


def test_nonnegative_allows_zero():
    t = cmdargs.NonNegative(int)
    assert t("0") == 0
    with pytest.raises(argparse.ArgumentTypeError):
        t("-1")


def test_bounded_and_proportion():
    t = cmdargs.Bounded(float, 1.0, 2.0)
    assert t("1.5") == 1.5
    with pytest.raises(argparse.ArgumentTypeError):
        t("2.5")
    assert cmdargs.proportion("0.25") == 0.25
    with pytest.raises(argparse.ArgumentTypeError):
        cmdargs.proportion("1.5")


def test_vector():
    v = cmdargs.Vector(float)("1 2 3.5")
    np.testing.assert_array_equal(v, np.array([1.0, 2.0, 3.5]))


def test_parse_to_named_tuple():
    p = make_parser()
    p.add_argument("--sharpen", nargs=3, metavar=("min", "max", "niter"),
                   type=(float, float, int), default=(1.0, 1.0, 25000),
                   action=cmdargs.ParseToNamedTuple)
    args = p.parse_args([])
    assert args.sharpen.min == 1.0 and args.sharpen.niter == 25000
    args = p.parse_args(["--sharpen", "0.5", "2.0", "100"])
    assert args.sharpen == (0.5, 2.0, 100)
    assert isinstance(args.sharpen.niter, int)


def test_autobool_pair():
    p = make_parser()
    p.add_argument("--flag", default=True, action=cmdargs.AutoBool,
                   help="a flag")
    assert p.parse_args([]).flag is True
    assert p.parse_args(["--no-flag"]).flag is False
    assert p.parse_args(["--flag"]).flag is True


def test_device_action_parsing():
    f = cmdargs.DeviceAction.str_to_device
    assert f("2") == 2
    assert f("tpu3") == 3
    assert f("cuda:1") == 1
    assert f("cpu") == "cpu"


def test_file_exists_action(tmp_path):
    p = make_parser()
    p.add_argument("path", action=cmdargs.FileExists)
    good = tmp_path / "x"
    good.write_text("hi")
    assert p.parse_args([str(good)]).path == str(good)
    with pytest.raises(RuntimeError):
        p.parse_args([str(tmp_path / "missing")])
