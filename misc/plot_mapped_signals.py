#!/usr/bin/env python3
"""Plot reference-to-signal maps from mapped signal files
(reference: misc/plot_mapped_signals.py)."""

import argparse
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.data.mapped_signal_files import MappedSignalReader  # noqa
from taiyaki_tpu.utils.cmdargs import Positive  # noqa: E402


def get_parser():
    parser = argparse.ArgumentParser(
        description="Plot reference-to-signal maps from mapped signal "
                    "files; dump one-line summary of each read to stdout",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--output",
                        help="Output PNG filename. Default: summaries only")
    parser.add_argument("--maxlegendsize", type=Positive(int), default=10,
                        help="Maximum number of reads in legend")
    parser.add_argument("--nreads", type=Positive(int), default=10,
                        help="Max reads per file (unless read_ids given)")
    parser.add_argument("--read_ids", nargs="+", default=[],
                        help="Specific read ids to plot")
    parser.add_argument("--xmin", default=None, type=float)
    parser.add_argument("--xmax", default=None, type=float)
    parser.add_argument("--ymin", default=None, type=float)
    parser.add_argument("--ymax", default=None, type=float)
    parser.add_argument("--line_transparency", type=float, default=1.0)
    parser.add_argument("--zero_signal_start", action="store_true",
                        help="Start signal locations at zero")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("mapped_signal_files", nargs="+",
                        help="One or more mapped signal files")
    return parser


def main():
    args = get_parser().parse_args()
    if args.output is not None:
        plt.figure(figsize=(12, 10))
    reads_sofar = 0
    for nfile, ms_fn in enumerate(args.mapped_signal_files):
        with MappedSignalReader(ms_fn) as msr:
            if args.read_ids:
                read_ids = args.read_ids
            else:
                read_ids = msr.get_read_ids()[:args.nreads]
                if not args.quiet:
                    sys.stderr.write(
                        "Reading first {} read ids in file {}\n".format(
                            args.nreads, ms_fn))
            # preserve the user-given order and warn about missing ids
            # (msr.reads sorts for determinism and drops absentees)
            present = set(msr.get_read_ids())
            missing = [r for r in read_ids if r not in present]
            for rid in missing:
                sys.stderr.write(
                    "* Warning: read id {} not in {}\n".format(rid, ms_fn))
            ordered = (msr.get_read(rid) for rid in read_ids
                       if rid in present)
            for nread, read in enumerate(ordered):
                mapped = read.Ref_to_signal >= 0
                if mapped.sum() == 0:
                    continue
                rts = read.Ref_to_signal.copy()
                if args.zero_signal_start:
                    rts[mapped] -= rts[mapped][0]
                info = "file {} read {}:{} reflen:{}, daclen:{}".format(
                    nfile, nread, read.read_id, len(rts) - 1,
                    len(read.Dacs))
                if not args.quiet:
                    sys.stdout.write(info + "\n")
                if args.output is not None:
                    x = np.arange(len(rts))[mapped]
                    y = rts[mapped]
                    for lim, arr, op in [(args.xmin, "x", ">="),
                                         (args.xmax, "x", "<="),
                                         (args.ymin, "y", ">="),
                                         (args.ymax, "y", "<=")]:
                        if lim is None:
                            continue
                        ref = x if arr == "x" else y
                        keep = ref >= lim if op == ">=" else ref <= lim
                        x, y = x[keep], y[keep]
                    plt.plot(x, y,
                             label=(info if reads_sofar < args.maxlegendsize
                                    else None),
                             linestyle="dashed" if nfile == 1 else "solid",
                             alpha=args.line_transparency)
                reads_sofar += 1
    if args.output is not None:
        plt.grid()
        plt.xlabel("Reference location")
        plt.ylabel("Signal location")
        plt.legend(loc="upper left", framealpha=0.3)
        plt.tight_layout()
        if not args.quiet:
            sys.stderr.write("Saving plot to {}\n".format(args.output))
        plt.savefig(args.output)


if __name__ == "__main__":
    main()
