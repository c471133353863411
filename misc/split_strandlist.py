#!/usr/bin/env python3
"""Split a strand list into several parts
(reference: misc/split_strandlist.py)."""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(
        description="Split a strand list into parts",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--nparts", type=int, default=2,
                        help="Number of parts to split into")
    parser.add_argument("--prefix", default=None,
                        help="Output prefix (default: input filename)")
    parser.add_argument("strandlist", help="Input strand list TSV")
    args = parser.parse_args()

    with open(args.strandlist) as fh:
        header = fh.readline()
        lines = fh.readlines()
    prefix = args.prefix or args.strandlist
    n = len(lines)
    per = -(-n // args.nparts)
    for part in range(args.nparts):
        out = "{}_part{}.tsv".format(prefix, part)
        with open(out, "w") as fh:
            fh.write(header)
            fh.writelines(lines[part * per:(part + 1) * per])
        sys.stderr.write("Wrote {}\n".format(out))


if __name__ == "__main__":
    main()
