#!/usr/bin/env python3
"""Plot output of predict_squiggle.py
(reference: misc/plot_predict_squiggle_output.py)."""

import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.utils import fileio  # noqa: E402


def main():
    print("Plots output of predict_squiggle.py\nUsage:\n"
          "plot_predict_squiggle_output.py <predict_squiggle_output_file> "
          "<output_png_file>")
    if len(sys.argv) < 3:
        print("ERROR: Needs command line arguments!")
        return
    table = fileio.readtsv(sys.argv[1])
    plt.figure(figsize=(16, 5))
    tstart = 0
    for row in table:
        current, sd, dwell = row["current"], row["sd"], row["dwell"]
        centre = tstart + dwell / 2
        plt.bar(centre, sd, dwell, current - sd / 2)
        plt.text(centre, current, str(row["base"]))
        tstart += dwell
    plt.xlabel("time")
    plt.ylabel("current")
    plt.grid()
    plt.savefig(sys.argv[2])


if __name__ == "__main__":
    main()
