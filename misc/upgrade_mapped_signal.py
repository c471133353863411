#!/usr/bin/env python3
"""Upgrade a mapped-signal HDF5 file to the current format version
(reference: misc/upgrade_mapped_signal.py — v7 -> v8: per-read alphabet
attrs become global, mod_long_names field added)."""

import argparse
import logging
import os
import sys
from shutil import copyfile

import h5py

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.utils.cmdargs import FileAbsent, FileExists  # noqa: E402
from taiyaki_tpu.utils.common_cmdargs import add_common_command_args  # noqa


def get_parser():
    parser = argparse.ArgumentParser(
        description="Upgrade mapped signal HDF5 file",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_command_args(parser, ["version"])
    parser.add_argument("input", action=FileExists,
                        help="Source mapped-signal HDF5")
    parser.add_argument("output", action=FileAbsent,
                        help="Destination path for the upgraded HDF5")
    return parser


def convert_7_to_8(h5):
    """v7 -> v8: hoist per-read alphabet attrs to the root; add
    mod_long_names."""
    input_version = h5.attrs["version"]
    if input_version > 7:
        return
    if input_version < 7:
        logging.error("Input version expected to be 7, got {}".format(
            input_version))
        return
    print("Upgrading to version 8")
    first_read = next(iter(h5["Reads"]))
    read0 = h5["Reads"][first_read]
    h5.attrs["alphabet"] = read0.attrs["alphabet"]
    h5.attrs["collapse_alphabet"] = read0.attrs["collapse_alphabet"]
    h5.attrs["mod_long_names"] = ""
    for read in h5["Reads"]:
        rh = h5["Reads"][read]
        del rh.attrs["alphabet"]
        del rh.attrs["collapse_alphabet"]
    h5.attrs["version"] = 8


def main():
    args = get_parser().parse_args()
    copyfile(args.input, args.output)
    with h5py.File(args.output, "r+", libver="v108", driver="core",
                   backing_store=True) as h5:
        convert_7_to_8(h5)


if __name__ == "__main__":
    main()
