#!/usr/bin/env python3
"""Generate a synthetic end-to-end training/evaluation dataset.

Produces, from one generative model (square-wave level per base + Gaussian
noise + Poisson dwells — the same family as the repo's test fixtures):

  <out>/train.hdf5      mapped-signal v8 file of N training reads
  <out>/holdout.fast5   multi-read fast5 of M held-out reads (signal only)
  <out>/holdout_refs.fa the held-out reads' true references

This closes the full product loop entirely inside the framework: train on
train.hdf5 (bin/train_flipflop.py), basecall holdout.fast5 (bin/basecall.py),
align + assess against holdout_refs.fa (misc/align.py, built-in aligner) —
the reference's workflow-level success criterion
(/root/reference/workflow/remap_from_samrefs_then_train_test_workflow.sh,
/root/reference/misc/assess_alignment.py) made runnable hermetically.

Usage: synth_dataset.py out_dir [--ntrain 400] [--nholdout 20]
           [--nbases 3000] [--mean_dwell 9] [--seed 1]
"""

import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from taiyaki_tpu.alphabet import AlphabetInfo  # noqa: E402
from taiyaki_tpu.data import mapped_signal_files  # noqa: E402
from taiyaki_tpu.data.signal_mapping import SignalMapping  # noqa: E402

LEVELS = np.array([-1.0, -0.3, 0.4, 1.1])
BASES = "ACGT"


def synth_read(rng, nbases, mean_dwell, noise=0.15):
    reference = rng.integers(0, 4, size=nbases).astype(np.int16)
    dwells = np.maximum(2, rng.poisson(mean_dwell, size=nbases))
    ref_to_sig = np.concatenate([[0], np.cumsum(dwells)]).astype(np.int32)
    siglen = int(ref_to_sig[-1])
    current = np.repeat(LEVELS[reference], dwells)
    current = current + rng.normal(0, noise, size=siglen)
    dacs = np.clip(current * 1000, -32000, 32000).astype(np.int16)
    return reference, ref_to_sig, dacs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--ntrain", type=int, default=400)
    ap.add_argument("--nholdout", type=int, default=20)
    ap.add_argument("--nbases", type=int, default=3000)
    ap.add_argument("--mean_dwell", type=float, default=9.0)
    ap.add_argument("--noise", type=float, default=0.15)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    ai = AlphabetInfo(BASES, BASES)

    train_path = os.path.join(args.out_dir, "train.hdf5")
    with mapped_signal_files.MappedSignalWriter(train_path, ai) as msw:
        for i in range(args.ntrain):
            reference, ref_to_sig, dacs = synth_read(
                rng, args.nbases, args.mean_dwell, args.noise)
            sm = SignalMapping(
                ref_to_sig, reference, read_id="synthtrain-%05d" % i,
                Dacs=dacs, shift_frompA=0.0, scale_frompA=1000.0,
                range=1.0, offset=0.0, digitisation=1.0)
            msw.write_read(sm.get_read_dictionary())

    f5_path = os.path.join(args.out_dir, "holdout.fast5")
    fa_path = os.path.join(args.out_dir, "holdout_refs.fa")
    with h5py.File(f5_path, "w") as f5, open(fa_path, "w") as fa:
        for i in range(args.nholdout):
            rid = "synthhold-%05d" % i
            reference, ref_to_sig, dacs = synth_read(
                rng, args.nbases, args.mean_dwell, args.noise)
            fa.write(">{}\n{}\n".format(
                rid, "".join(BASES[b] for b in reference)))
            grp = f5.create_group("read_" + rid)
            ch = grp.create_group("channel_id")
            # Dacs were synthesized at scale_frompA=1000: pA = dacs/1000.
            # fast5 convention: pA = (dacs + offset) * range / digitisation.
            ch.attrs["digitisation"] = 8192.0
            ch.attrs["offset"] = 0.0
            ch.attrs["range"] = 8.192
            ch.attrs["sampling_rate"] = 4000.0
            raw = grp.create_group("Raw")
            raw.attrs["read_id"] = rid
            raw.attrs["start_time"] = 0
            raw.attrs["duration"] = len(dacs)
            raw.attrs["read_number"] = i
            raw.attrs["median_before"] = 0.0
            raw.create_dataset("Signal", data=dacs, dtype="i2")

    print("wrote {} ({} reads), {} + {} ({} reads)".format(
        train_path, args.ntrain, f5_path, fa_path, args.nholdout))


if __name__ == "__main__":
    main()
