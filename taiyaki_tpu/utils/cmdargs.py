"""argparse extensions (reference: taiyaki/cmdargs.py).

Typed actions/validators shared by the bin/ CLI scripts; the schedule
triples (e.g. --sharpen min max niter) use ParseToNamedTuple exactly like
the reference so command lines are drop-in compatible.
"""

import argparse
import os
from collections import namedtuple


class display_version_and_exit(argparse.Action):
    def __init__(self, **kwargs):
        self.__version__ = kwargs["metavar"]
        super().__init__(**kwargs)

    def __call__(self, parser, namespace, values, option_string=None):
        print(self.__version__)
        exit(0)


class FileExists(argparse.Action):
    """Validates that the argument path exists."""

    def __call__(self, parser, namespace, values, option_string=None):
        if not os.path.exists(values):
            raise RuntimeError("File/path for '{}' does not exist, {}"
                               .format(self.dest, values))
        setattr(namespace, self.dest, values)


class FileAbsent(argparse.Action):
    """Validates that the argument path does not exist."""

    def __call__(self, parser, namespace, values, option_string=None):
        if os.path.exists(values):
            raise RuntimeError("File/path for '{}' exists, {}"
                               .format(self.dest, values))
        setattr(namespace, self.dest, values)


class ParseToNamedTuple(argparse.Action):
    """Parse an nargs>1 option into a named tuple, e.g.
    --sharpen min max niter -> Values(min=..., max=..., niter=...)."""

    def __init__(self, **kwargs):
        assert "metavar" in kwargs and "type" in kwargs
        assert len(kwargs["metavar"]) == kwargs["nargs"]
        assert len(kwargs["type"]) == kwargs["nargs"]
        self._types = kwargs["type"]
        kwargs["type"] = str
        self.Values = namedtuple("Values", " ".join(kwargs["metavar"]))
        super().__init__(**kwargs)
        if self.default is not None:
            self.default = self.Values(*self.default)

    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest,
                self.Values(*[f(v) for f, v in zip(self._types, values)]))

    @staticmethod
    def value_as_string(value):
        return " ".join(str(x) for x in value)


class AutoBool(argparse.Action):
    """--foo / --no-foo boolean pair."""

    def __init__(self, option_strings, dest, default=None, required=False,
                 help=None):
        if default is None:
            raise ValueError("You must provide a default with AutoBool")
        if len(option_strings) != 1 or not option_strings[0].startswith("--"):
            raise ValueError("AutoBool takes a single --argument")
        opt = option_strings[0][2:]
        opts = ["--" + opt, "--no-" + opt]
        default_opt = opts[0] if default else opts[1]
        super().__init__(opts, dest, nargs=0, const=None, default=default,
                         required=required,
                         help="{} (default: {})".format(help, default_opt))

    def __call__(self, parser, namespace, values, option_strings=None):
        setattr(namespace, self.dest,
                not option_strings.startswith("--no-"))


class Maybe:
    """Type wrapper allowing the literal 'None'."""

    def __init__(self, mytype):
        self.mytype = mytype

    def __repr__(self):
        return "None or {}".format(self.mytype)

    def __call__(self, y):
        if y == "None":
            return None
        return self.mytype(y)


class Bounded:
    """Type wrapper enforcing lower <= x <= upper."""

    def __init__(self, mytype, lower, upper):
        self.mytype = mytype
        self.lower = lower
        self.upper = upper

    def __repr__(self):
        return "bounded {} [{}, {}]".format(self.mytype, self.lower,
                                            self.upper)

    def __call__(self, y):
        yt = self.mytype(y)
        if yt < self.lower or yt > self.upper:
            raise argparse.ArgumentTypeError(
                "Argument must be in range [{}, {}]".format(self.lower,
                                                            self.upper))
        return yt


class Positive:
    """Type wrapper enforcing x > 0."""

    def __init__(self, mytype):
        self.mytype = mytype

    def __repr__(self):
        return "positive {}".format(self.mytype)

    def __call__(self, y):
        yt = self.mytype(y)
        if yt <= 0:
            raise argparse.ArgumentTypeError("Argument must be positive")
        return yt


def NonNegative(mytype):
    """Type enforcing x >= 0."""
    def check(y):
        yt = mytype(y)
        if yt < 0:
            raise argparse.ArgumentTypeError(
                "Argument must be non-negative")
        return yt
    return check


def proportion(p):
    """Float in [0, 1]."""
    return Bounded(float, 0.0, 1.0)(p)


probability = proportion


def Vector(mytype):
    """Type for space-separated vectors parsed into numpy arrays."""
    import numpy as np

    def parse(value):
        return np.array([mytype(v) for v in value.split()])
    return parse


class DeviceAction(argparse.Action):
    """Normalize device specs: 2 -> 2, 'tpu3' -> 3, 'cpu' -> 'cpu'."""

    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest, self.str_to_device(values))

    @staticmethod
    def str_to_device(value):
        try:
            return int(value)
        except ValueError:
            pass
        for prefix in ("tpu", "cuda", "device"):
            if value.startswith(prefix):
                tail = value[len(prefix):].lstrip(":")
                if tail.isdigit():
                    return int(tail)
        return value
