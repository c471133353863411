#!/usr/bin/env python3
"""Plot an accuracy histogram from a combined alignment-summary file
(reference: misc/plot_accuracy_histogram_from_alignment_summary.py)."""

import argparse
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.utils.cmdargs import FileExists, Positive  # noqa: E402
from taiyaki_tpu.utils.fileio import readtsv  # noqa: E402


def get_parser():
    parser = argparse.ArgumentParser(
        description="Plot an accuracy histogram from a combined read file",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("combined_read_file", action=FileExists,
                        help="Alignment summary TSV to plot")
    parser.add_argument("--bins", default=100, type=Positive(int),
                        help="Histogram bin count")
    parser.add_argument("--title", default="", help="Title drawn above the plot")
    parser.add_argument("--output_name",
                        default="basecaller_histogram.png",
                        help="Path for the rendered figure")
    return parser


def main():
    args = get_parser().parse_args()
    acc = np.asarray(readtsv(args.combined_read_file)["alignment_accuracy"],
                     dtype=float)
    fig, ax = plt.subplots()
    ax.set_title(bytes(args.title, "utf-8").decode("unicode_escape"),
                 fontsize=7)
    ax.set_xlabel("Accuracy")
    ax.set_ylabel("Reads")
    ax.minorticks_on()
    ax.grid(which="major", linestyle=":")
    ax.grid(which="minor", linestyle=":")
    plt.hist(acc[acc >= 0], bins=args.bins)
    plt.tight_layout()
    plt.savefig(args.output_name)


if __name__ == "__main__":
    main()
