#!/bin/bash -eu
# Repack an HDF5 file with gzip+shuffle compression
# (reference: misc/compress_hdf5.sh).
if [ $# -ne 2 ]; then
    echo "Usage: $0 input.hdf5 output.hdf5"
    exit 1
fi
h5repack -f SHUF -f GZIP=1 "$1" "$2"
