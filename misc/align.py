#!/usr/bin/env python3
"""Align basecalls to a reference (bwa-mem wrapper) and assess accuracy
(reference: misc/align.py).  Requires `bwa` on PATH for alignment; SAM/BAM
inputs skip straight to assessment."""

import argparse
import os
import subprocess
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from assess_alignment import (  # noqa: E402
    get_parser as assess_get_parser, main as assess_main)
from taiyaki_tpu.utils.cmdargs import AutoBool, proportion  # noqa: E402


def get_parser():
    parser = argparse.ArgumentParser(
        description="Align reads to reference and obtain accuracy metrics",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument(
        "--bwa_mem_args", metavar="args",
        default="-k14 -W20 -r10 -t 16 -A 1 -B 2 -O 2 -E 1",
        help="Extra flags forwarded to bwa mem")
    assess_grp = parser.add_argument_group("Alignment Assessment Arguments")
    assess_grp.add_argument("--coverage", metavar="proportion", default=0.6,
                            type=proportion, help="Coverage floor for including an alignment")
    assess_grp.add_argument("--data_name", default=None,
                            help="Label for the dataset (defaults to the file name).")
    assess_grp.add_argument("--figure_format", default="png",
                            help="Image format for saved figures.")
    assess_grp.add_argument("--show_median", default=False, action=AutoBool,
                            help="Annotate the histogram with the median")
    assess_grp.add_argument("--reference", default=None,
                            help="Fasta to align the queries against")
    parser.add_argument("files", metavar="input", nargs="+",
                        help="Query sequence file(s) to align")
    return parser


def call_bwa_mem(fin, fout, genome, clargs=""):
    """Run bwa mem; raises CalledProcessError on failure."""
    command_line = "bwa mem {} {} {} > {}".format(clargs, genome, fin, fout)
    return subprocess.check_output(command_line, stderr=subprocess.STDOUT,
                                   shell=True, universal_newlines=True)


def _looks_like_alignment(fn):
    """SAM/BAM detection that cannot misfire on FASTQ: FASTQ records
    also start with '@' (and .fastq.gz shares the gzip magic), so
    require the BAM\\x01 magic after gunzip or a real SAM header tag
    (@HD/@SQ/@RG/@PG/@CO followed by a tab)."""
    import gzip
    with open(fn, "rb") as fh:
        head = fh.read(4)
    if head[:2] == b"\x1f\x8b":
        try:
            with gzip.open(fn, "rb") as gz:
                return gz.read(4) == b"BAM\x01"
        except OSError:
            return False
    try:
        with open(fn, "rt") as fh:
            line = fh.readline()
    except UnicodeDecodeError:
        return False
    tag = line[:3]
    return (line.startswith("@")
            and tag in ("@HD", "@SQ", "@RG", "@PG", "@CO")
            and (len(line) <= 3 or line[3] in "\t\n"))


def main():
    args = get_parser().parse_args()
    exit_code = 0
    for fn in args.files:
        if _looks_like_alignment(fn):
            align_fn = fn
        else:
            sys.stdout.write(
                "Input file does not appear to be a SAM/BAM file. "
                "Alignment will be performed.\n")
            align_fn = "{}.sam".format(os.path.splitext(fn)[0])
            sys.stdout.write("Aligning {}...\n".format(fn))
            try:
                out = call_bwa_mem(fn, align_fn, args.reference,
                                   args.bwa_mem_args)
                sys.stdout.write(out)
            except Exception:
                sys.stderr.write("{}: something went wrong, skipping\n\n{}\n"
                                 .format(fn, traceback.format_exc()))
                exit_code = 1
                continue
        assess_args = [align_fn, "--coverage", str(args.coverage),
                       "--figure_format", str(args.figure_format)]
        if args.data_name is not None:
            assess_args.extend(["--data_name", str(args.data_name)])
        if args.show_median:
            assess_args.append("--show_median")
        try:
            assess_main(assess_get_parser().parse_args(assess_args))
        except SystemExit as e:
            exit_code = max(exit_code, int(e.code or 0))
    sys.exit(exit_code)


if __name__ == "__main__":
    main()
