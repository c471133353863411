#!/usr/bin/env python3
"""Print the tree structure of an HDF5 file
(reference: misc/check_hdf5_contents.py)."""

import argparse

import h5py


def main():
    parser = argparse.ArgumentParser(
        description="List contents of an HDF5 file")
    parser.add_argument("input", help="HDF5 file to inspect")
    args = parser.parse_args()
    with h5py.File(args.input, "r") as f:
        print("Root attrs:", dict(f.attrs))

        def show(name, obj):
            if isinstance(obj, h5py.Dataset):
                print("{}  dataset shape={} dtype={}".format(
                    name, obj.shape, obj.dtype))
            else:
                attrs = dict(obj.attrs)
                print("{}/  group{}".format(
                    name, " attrs=" + str(attrs) if attrs else ""))

        f.visititems(show)


if __name__ == "__main__":
    main()
