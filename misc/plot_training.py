#!/usr/bin/env python3
"""Plot training/validation loss curves from batch.log / validation.log
(reference: misc/plot_training.py)."""

import argparse
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.constants import (  # noqa: E402
    BATCH_LOG_FILENAME, VALID_LOG_FILENAME)
from taiyaki_tpu.utils import fileio  # noqa: E402
from taiyaki_tpu.utils.cmdargs import Positive  # noqa: E402


def get_parser():
    parser = argparse.ArgumentParser(
        description="Plot graphs of training loss",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument(
        "--mav", default=None, type=int,
        help="Moving average window applied to batchlog loss")
    parser.add_argument("--upper_y_limit", default=None,
                        type=Positive(float))
    parser.add_argument("--lower_y_limit", default=None,
                        type=Positive(float))
    parser.add_argument("--upper_x_limit", default=None,
                        type=Positive(float))
    parser.add_argument("--lower_x_limit", default=None,
                        type=Positive(float))
    parser.add_argument("output", help="Destination png path")
    parser.add_argument(
        "input_directories", nargs="+",
        help="Training output directories (each holding {} and {})".format(
            BATCH_LOG_FILENAME, VALID_LOG_FILENAME))
    return parser


def moving_average(a, n=3):
    """Moving average; shorter prefixes average what is available."""
    x = np.cumsum(a, dtype=float)
    m = len(x)
    if m > n:
        x[n:] = (x[n:] - x[:-n]) / n
    x[:n] = x[:n] / np.arange(1, min(n, m) + 1)
    return x


def main():
    args = get_parser().parse_args()
    plt.figure(figsize=(6, 4.8))
    colours = plt.rcParams["axes.prop_cycle"].by_key()["color"]
    for td, colour in zip(args.input_directories, colours):
        label = os.path.basename(os.path.normpath(td))
        batch = fileio.readtsv(os.path.join(td, BATCH_LOG_FILENAME))
        loss = np.asarray(batch["loss"], dtype=float)
        if args.mav is not None:
            loss = moving_average(loss, args.mav)
        plt.plot(batch["iter"], loss, color=colour,
                 label=label + " (training)", alpha=0.5, linewidth=0.5)
        val = fileio.readtsv(os.path.join(td, VALID_LOG_FILENAME))
        if len(np.atleast_1d(val["iter"])) == 0:
            print("No validation log data for {}.".format(td))
            continue
        plt.plot(val["iter"], val["loss"], color=colour,
                 label=label + " (validation)", linewidth=0.5)
    plt.grid()
    plt.xlabel("Iterations")
    plt.ylabel("Loss")
    if args.upper_y_limit is not None:
        plt.ylim(top=args.upper_y_limit)
    if args.lower_y_limit is not None:
        plt.ylim(bottom=args.lower_y_limit)
    if args.upper_x_limit is not None:
        plt.xlim(right=args.upper_x_limit)
    if args.lower_x_limit is not None:
        plt.xlim(left=args.lower_x_limit)
    leg = plt.legend(loc="upper right")
    for legobj in leg.legend_handles:
        legobj.set_linewidth(4.0)
    if args.mav is not None:
        plt.title("Moving average window = {} iterations".format(args.mav))
    plt.tight_layout()
    plt.savefig(args.output, dpi=300)
    plt.close()


if __name__ == "__main__":
    main()
