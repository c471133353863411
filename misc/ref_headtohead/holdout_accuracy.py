#!/usr/bin/env python3
"""Basecall-accuracy head-to-head on the held-out read.

Reconstructs a fast5 from the validation read's raw Dacs in the mapped-
signal file (channel attrs copied, so the basecaller's scaling sees the
original signal), writes its Reference as fasta, then basecalls it with
each given checkpoint (`bin/basecall.py`) and scores accuracy with the
built-in glocal aligner (`misc/align.py`).  Complements the loss-based
comparison in docs/training_parity.md with the reference's de-facto
quality metric (reference: misc/assess_alignment.py).

Usage:
  holdout_accuracy.py mapped.hdf5 READ_ID out_dir \
      name1:ckpt1 [name2:ckpt2 ...]
"""

import argparse
import os
import subprocess
import sys

import h5py
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, os.pardir, os.pardir)


def write_fast5_and_ref(mapped, read_id, outdir):
    reads_dir = os.path.join(outdir, "reads")
    os.makedirs(reads_dir, exist_ok=True)
    sys.path.insert(0, REPO)
    from taiyaki_tpu.data import mapped_signal_files
    with mapped_signal_files.MappedSignalReader(mapped) as msr:
        # collapse mod labels to canonical letters (cat_mod files carry
        # labels >= 4); the reader handles both per-read and batch layouts
        collapse = msr.get_alphabet_information().collapse_alphabet
        read = next(iter(msr.reads([read_id])))
    dacs = np.asarray(read.Dacs)
    ref = np.asarray(read.Reference)
    at = {k: getattr(read, k)
          for k in ("digitisation", "offset", "range")}
    with h5py.File(os.path.join(reads_dir, "holdout.fast5"), "w") as f5:
        grp = f5.create_group("read_" + read_id)
        ch = grp.create_group("channel_id")
        for k in ("digitisation", "offset", "range"):
            ch.attrs[k] = at[k]
        ch.attrs["sampling_rate"] = 4000.0
        raw = grp.create_group("Raw")
        raw.attrs["read_id"] = read_id
        raw.attrs["start_time"] = 0
        raw.attrs["duration"] = int(dacs.size)
        raw.create_dataset("Signal", data=dacs.astype(np.int16), dtype="i2")
    ref_fa = os.path.join(outdir, "ref.fasta")
    with open(ref_fa, "w") as out:
        out.write(">" + read_id + "\n"
                  + "".join(collapse[b] for b in ref) + "\n")
    return reads_dir, ref_fa


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("mapped", help="mapped-signal HDF5 holding the read")
    p.add_argument("read_id")
    p.add_argument("outdir")
    p.add_argument("models", nargs="+", metavar="name:checkpoint")
    args = p.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    reads_dir, ref_fa = write_fast5_and_ref(
        args.mapped, args.read_id, args.outdir)

    for spec in args.models:
        name, ckpt = spec.split(":", 1)
        fasta = os.path.join(args.outdir, name + ".fasta")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bin", "basecall.py"),
             reads_dir, ckpt, "--output", fasta], check=True)
        print("== %s" % name)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "misc", "align.py"),
             fasta, "--reference", ref_fa, "--coverage", "0.1"],
            check=True)


if __name__ == "__main__":
    main()
