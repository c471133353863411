#!/usr/bin/env python3
"""Cross-evaluate a checkpoint under the SAME validation methodology.

Replicates bin/train_flipflop.py's frozen reporting batches (sequential
strand walk, deterministic under --seed) and reports mean validation
loss — so a taiyaki_tpu-trained checkpoint and an IMPORTED
reference-trained checkpoint (misc/import_torch_checkpoint.py) can be
scored on identical chunks by identical code, removing any
validation-methodology difference from the head-to-head comparison
(docs/training_parity.md).

Usage:
  eval_checkpoint.py ckpt mapped.hdf5 --reporting_strand_list val.tsv
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))

from taiyaki_tpu import layers, train                        # noqa: E402
from taiyaki_tpu.data import chunk_selection, mapped_signal_files  # noqa: E402
from taiyaki_tpu.utils import helpers                        # noqa: E402
from taiyaki_tpu.utils.fileio import readtsv                 # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("checkpoint")
    p.add_argument("input", help="mapped-signal HDF5")
    p.add_argument("--reporting_strand_list", required=True)
    p.add_argument("--chunk_len", type=int, default=2000)
    p.add_argument("--filter_chunk_len", type=int, default=None,
                   help="chunk length for filter-parameter sampling; "
                        "must equal the TRAINER's chunk_len_max (and the "
                        "trainer's filter flags must have been defaults) "
                        "for the frozen batches to match its. Defaults "
                        "to --chunk_len.")
    p.add_argument("--sub_batch_size", type=int, default=32)
    p.add_argument("--reporting_sub_batches", type=int, default=2)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--sharpen", type=float, default=1.0)
    p.add_argument("--filter_path_buffer", type=float, default=1.1)
    args = p.parse_args()

    np.random.seed(args.seed)

    with mapped_signal_files.MappedSignalReader(args.input) as msr:
        alphabet_info = msr.get_alphabet_information()
        read_data = list(msr.reads(None))

    net, params, _src, _meta, _kwargs, _opt = helpers.load_model(
        args.checkpoint, alphabet_info=alphabet_info)
    assert params is not None, "expected a checkpoint with parameters"
    stride = net.stride
    is_cat_mod = layers.is_cat_mod_model(net)
    can_labels = mod_labels = can_mods_offsets = None
    if is_cat_mod:
        head = net.sublayers[-1]
        can_mods_offsets = head.can_mods_offsets
        can_labels, mod_labels = head.can_labels, head.mod_labels

    filter_params = chunk_selection.sample_filter_parameters(
        read_data, 100000,
        args.filter_chunk_len or args.chunk_len, 3.0, 10.0, 0.5, stride,
        args.filter_path_buffer)

    ids = set(str(v) for v in readtsv(args.reporting_strand_list,
                                      ["read_id"])["read_id"])
    reporting_data = [r for r in read_data if r.read_id in ids]
    assert reporting_data, "no reporting reads found in input"

    val_max_seqlen = train.max_seqlen_for_chunk(
        args.chunk_len, stride, args.filter_path_buffer)
    batches = []
    first_strand = 0
    for _ in range(args.reporting_sub_batches):
        vb, vrej = train.sample_batch(
            reporting_data, args.chunk_len, args.sub_batch_size,
            val_max_seqlen, alphabet_info, filter_params,
            can_labels=can_labels, mod_labels=mod_labels,
            select_strands_randomly=False, first_strand_index=first_strand)
        first_strand += sum(vrej.values())
        batches.append(vb)

    import jax
    mod_cat_weights = (np.ones(alphabet_info.nbase, dtype=np.float32)
                       if is_cat_mod else None)
    loss_fn = jax.jit(train.make_loss_fn(
        net, is_cat_mod, can_mods_offsets, mod_cat_weights))
    losses = [float(loss_fn(params, vb, args.sharpen)) for vb in batches]
    print("per-sub-batch losses:", ", ".join("%.4f" % v for v in losses))
    print("mean validation loss: %.4f" % float(np.mean(losses)))


if __name__ == "__main__":
    main()
