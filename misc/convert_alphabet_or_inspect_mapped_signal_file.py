#!/usr/bin/env python3
"""Convert (or print) the alphabet attributes inside a mapped signal file
(reference: misc/convert_alphabet_or_inspect_mapped_signal_file.py).
Attributes are adjusted in place; mod->canonical associations cannot be
changed here."""

import argparse
import os
import re
import sys

import h5py

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.data.mapped_signal_files import MappedSignalReader  # noqa


def get_parser():
    parser = argparse.ArgumentParser(
        description="Convert (or print) alphabet attributes contained "
                    "within a mapped signal file.")
    parser.add_argument("input", help="Mapped-signal HDF5 to operate on.")
    parser.add_argument("--print_only", action="store_true",
                        help="Only print the alphabet information.")
    parser.add_argument("--print_read_total", action="store_true",
                        help="Print the number of reads in this file.")
    parser.add_argument("--can_base_convert", nargs=2, default=[],
                        action="append",
                        help="Current and new single-letter canonical base")
    parser.add_argument("--mod_base_convert", nargs=2, default=[],
                        action="append",
                        help="Current and new single-letter modified base")
    parser.add_argument("--mod_long_name_convert", nargs=2, default=[],
                        action="append",
                        help="Current and new modified base long names")
    return parser


def main():
    args = get_parser().parse_args()
    with MappedSignalReader(args.input) as msr:
        ai = msr.get_alphabet_information()
        n_reads = len(msr.get_read_ids()) if args.print_read_total else None
    sys.stderr.write('File, "{}", currently contains: {}\n'.format(
        args.input, ai))
    if args.print_read_total:
        sys.stderr.write('File, "{}", contains {} total reads\n'.format(
            args.input, n_reads))
    if args.print_only:
        sys.exit()

    alphabet = list(ai.alphabet)
    collapse = list(ai.collapse_alphabet)
    long_names = list(ai.mod_long_names)

    for curr, new in args.can_base_convert:
        assert len(curr) == 1 and len(new) == 1, (
            "Single letter codes must be a single character")
        if curr not in ai.can_bases_set:
            sys.exit("Specified current canonical base ({}) not found in "
                     "file.".format(curr))
        alphabet[ai.alphabet.index(curr)] = new
        for m in re.finditer(curr, ai.collapse_alphabet):
            collapse[m.start()] = new
    for curr, new in args.mod_base_convert:
        assert len(curr) == 1 and len(new) == 1, (
            "Single letter codes must be a single character")
        if curr not in ai.mod_bases_set:
            sys.exit("Specified current modified base ({}) not found in "
                     "file.".format(curr))
        alphabet[ai.alphabet.index(curr)] = new
    # rename against the ORIGINAL names (reference semantics): chained
    # conversions must not see each other's results, and the attr is
    # newline-joined so new names must not contain newlines
    orig_long_names = list(ai.mod_long_names)
    for curr, new in args.mod_long_name_convert:
        assert "\n" not in new, (
            "Modified base long names cannot contain newlines")
        if curr not in orig_long_names:
            sys.exit("Specified current long name ({}) not found in "
                     "file.".format(curr))
        long_names[orig_long_names.index(curr)] = new

    if not (args.can_base_convert or args.mod_base_convert
            or args.mod_long_name_convert):
        sys.exit("No new alphabet information provided.")

    with h5py.File(args.input, "r+") as h5:
        h5.attrs["alphabet"] = "".join(alphabet)
        h5.attrs["collapse_alphabet"] = "".join(collapse)
        h5.attrs["mod_long_names"] = "\n".join(long_names)
    sys.stderr.write("Updated alphabet to {} (collapse {})\n".format(
        "".join(alphabet), "".join(collapse)))


if __name__ == "__main__":
    main()
