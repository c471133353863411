#!/usr/bin/env python3
"""Log-odds of base abundance around given coordinates (motif detection)
(reference: misc/motif.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.bio import fasta_file_to_dict  # noqa: E402
from taiyaki_tpu.utils.cmdargs import AutoBool, FileExists, Positive  # noqa
from taiyaki_tpu.utils.fileio import readtsv  # noqa: E402

BASES = {b: i for i, b in enumerate("ACGT")}


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--refbackground", default=False, action=AutoBool,
                        help="Estimate base background frequencies from the fasta")
    parser.add_argument("--down", metavar="bases", type=Positive(int),
                        default=15, help="bases to keep downstream of the site")
    parser.add_argument("--up", metavar="bases", type=Positive(int),
                        default=15, help="bases to keep upstream of the site")
    parser.add_argument("references", action=FileExists,
                        help="Reference fasta to scan")
    parser.add_argument("coordinates", action=FileExists,
                        help="coordinates file (columns filename, pos)")
    return parser


def main():
    args = get_parser().parse_args()
    up = args.up + 1
    refdict = fasta_file_to_dict(args.references)
    coordinates = readtsv(args.coordinates)

    background_counts = np.zeros(len(BASES), dtype=float)
    if args.refbackground:
        for ref in refdict.values():
            background_counts += [ref.count(b) for b in BASES]

    frags = []
    for coord in coordinates:
        readname, pos = str(coord["filename"]), int(coord["pos"])
        if pos < args.down or readname not in refdict:
            continue
        ref = refdict[readname]
        if pos + up > len(ref):
            continue
        frag = ref[pos - args.down:pos + up]
        frags.append(np.array([BASES[b] for b in frag]))
    if not frags:
        print("No reads")
        return

    frag_array = np.stack(frags).T
    count_array = []
    for pos_array in frag_array:
        counts = np.bincount(pos_array, minlength=len(BASES))
        count_array.append(counts)
        if not args.refbackground:
            background_counts += counts
    background_counts /= background_counts.sum()
    position_counts = np.stack(count_array) / len(frags)
    log_odds = np.log(position_counts / background_counts)
    for pos, row in zip(range(-args.down, up), log_odds):
        print(pos, row)


if __name__ == "__main__":
    main()
