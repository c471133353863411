#!/usr/bin/env python3
"""Check integrity of a mapped-signal file and print a summary
(reference: misc/check_mapped_signal_file.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.data.mapped_signal_files import MappedSignalReader  # noqa
from taiyaki_tpu.utils.cmdargs import FileExists, Maybe, Positive  # noqa


def get_parser():
    parser = argparse.ArgumentParser(
        description="Check a mapped signal file",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument(
        "--limit_report_lines", default=100, type=Positive(int),
        help="Maximum number of error lines to report")
    parser.add_argument(
        "--summary_limit", default=10, type=Maybe(Positive(int)),
        help="Number of reads to summarize (None for all)")
    parser.add_argument("input", action=FileExists,
                        help="Mapped signal file")
    return parser


def main():
    args = get_parser().parse_args()
    with MappedSignalReader(args.input) as msr:
        print("* File version:", msr.version)
        ai = msr.get_alphabet_information()
        print("* Alphabet: {} (collapse: {})".format(
            ai.alphabet, ai.collapse_alphabet))
        if ai.nmod_base > 0:
            print("* Modified bases:", ai.mod_long_names)
        read_ids = msr.get_read_ids()
        print("* {} reads".format(len(read_ids)))
        verdict = msr.check(args.limit_report_lines)
        print("* Integrity check:", verdict.strip())
        dwells, lens = [], []
        for i, read in enumerate(msr.reads()):
            if args.summary_limit is not None and i >= args.summary_limit:
                break
            d0, d1 = read.get_mapped_dacs_region()
            r0, r1 = read.get_mapped_reference_region()
            if r1 > r0:
                dwells.append((d1 - d0) / (r1 - r0))
            lens.append(read.reflen)
        if dwells:
            print("* Mean dwell over sampled reads: median {:.2f} "
                  "(range {:.2f}-{:.2f})".format(
                      float(np.median(dwells)), min(dwells), max(dwells)))
        if lens:  # independent of dwell: print even if nothing mapped
            print("* Reference lengths: median {:.0f} "
                  "(range {}-{})".format(
                      float(np.median(lens)), min(lens), max(lens)))
    sys.exit(0 if verdict.strip() == "pass" else 1)


if __name__ == "__main__":
    main()
