#!/usr/bin/env python3
"""Prepare training data: remap raw reads to references with a flip-flop
model and write a mapped-signal HDF5 file
(reference: bin/prepare_mapped_reads.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def get_parser():
    from taiyaki_tpu.utils.cmdargs import FileExists, Maybe
    from taiyaki_tpu.utils.common_cmdargs import add_common_command_args

    parser = argparse.ArgumentParser(
        description="Prepare data for model training and save to hdf5 file "
                    "by remapping with flip-flop model",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_command_args(
        parser, ("alphabet device input_folder input_strand_list jobs limit "
                 "overwrite recursive version").split())
    parser.add_argument(
        "--localpen", metavar="penalty", default=0.0, type=float,
        help="Score cost for clipped (local) remapping")
    parser.add_argument(
        "--max_read_length", metavar="bases", default=None, type=Maybe(int),
        help="Don't attempt remapping for reads longer than this")
    parser.add_argument(
        "--mod", nargs=3,
        metavar=("mod_base", "canonical_base", "mod_long_name"),
        default=[], action="append", help="Modified-base definition (mod, canonical base, long name)")
    parser.add_argument(
        "--batch_format", action="store_true",
        help="Output batched mapped signal file format (better I/O "
             "performance and less disk space).")
    parser.add_argument(
        "input_per_read_params", action=FileExists,
        help="Per-read parameter TSV (from generate_per_read_params.py)")
    parser.add_argument("output", help="Destination mapped-signal HDF5 file")
    parser.add_argument("model", action=FileExists,
                        help="Model file (.checkpoint or .py)")
    parser.add_argument(
        "references", action=FileExists,
        help="Fasta with one ground-truth reference per read id")
    return parser


def main():
    args = get_parser().parse_args()
    # Remapping quality should not pay for the bf16 training-throughput
    # trade (taiyaki_tpu/ops/rnn.py); exported env wins if set.
    os.environ.setdefault("TAIYAKI_TPU_F32_GATES", "1")
    os.environ.setdefault("TAIYAKI_TPU_F32_SCORES", "1")
    print("Running prepare_mapping using flip-flop remapping")

    if not args.overwrite and os.path.exists(args.output):
        print("Cowardly refusing to overwrite {}".format(args.output))
        sys.exit(1)

    import jax
    # True f32 for every XLA matmul/conv, like bin/basecall.py: the
    # TPU's DEFAULT precision runs f32 dots as one bf16 pass, and
    # remapping quality should match the CPU reference (the Pallas
    # kernels honor the same intent via TAIYAKI_TPU_F32_GATES above)
    jax.config.update("jax_default_matmul_precision", "highest")
    from taiyaki_tpu.utils.helpers import select_jax_platform
    select_jax_platform(args.device)

    from taiyaki_tpu import alphabet, bio
    from taiyaki_tpu.data import fast5utils
    from taiyaki_tpu.iterators import imap_mp
    from taiyaki_tpu.prepare_mapping_funcs import (
        batched_remap_results, generate_output_from_results,
        get_per_read_params_dict_from_tsv, oneread_remap)
    from taiyaki_tpu.utils import helpers

    modified_bases = [elt[0] for elt in args.mod]
    canonical_bases = [elt[1] for elt in args.mod]
    for b in modified_bases:
        assert len(b) == 1, (
            "Modified bases must be a single character, got {}".format(b))
        assert b not in args.alphabet, (
            "Modified base must not be a canonical base, got {}".format(b))
    for b in canonical_bases:
        assert len(b) == 1, (
            "Canonical coding for modified bases must be a single "
            "character, got {}".format(b))
        assert b in args.alphabet, (
            "Canonical coding for modified base must be a canonical base, "
            "got {}".format(b))
    full_alphabet = args.alphabet + "".join(modified_bases)
    flat_alphabet = args.alphabet + "".join(canonical_bases)
    modification_names = [elt[2] for elt in args.mod]
    alphabet_info = alphabet.AlphabetInfo(
        full_alphabet, flat_alphabet, modification_names, do_reorder=True)
    print("Converting references to labels using {}".format(alphabet_info))

    fast5_reads = fast5utils.iterate_fast5_reads(
        args.input_folder, limit=args.limit,
        strand_list=args.input_strand_list, recursive=args.recursive)

    net, params, _, _, _, _ = helpers.load_model(args.model)
    if params is None:
        params = net.init(np.random.default_rng(0))
        sys.stderr.write("* Warning: remapping with a freshly initialised "
                         "model — pass a .checkpoint for real use.\n")

    kwargs = {
        "net": net,
        "params": params,
        "per_read_params_dict": get_per_read_params_dict_from_tsv(
            args.input_per_read_params),
        "alphabet_info": alphabet_info,
        "max_read_length": args.max_read_length,
        "localpen": args.localpen,
    }

    def iter_jobs():
        references = bio.fasta_file_to_dict(args.references,
                                            alphabet=full_alphabet)
        for fn, read_id in fast5_reads:
            yield fn, read_id, references.get(read_id, None)

    if args.device != "cpu":
        # Accelerator path: one process drives the chip with batched,
        # length-bucketed forwards; --jobs sizes the IO thread pool.
        # (The reference's GPU path runs one model per worker process;
        # taiyaki/prepare_mapping_funcs.py `device` arg.)  An integer
        # --device selects that device index.
        device = (jax.devices()[args.device]
                  if isinstance(args.device, int) else None)
        results = batched_remap_results(
            iter_jobs(), io_threads=args.jobs, device=device, **kwargs)
    else:
        if args.limit is not None:
            chunksize = int(np.clip(args.limit // (2 * args.jobs), 1, 50))
        else:
            chunksize = 50
        results = imap_mp(
            oneread_remap, iter_jobs(), threads=args.jobs,
            fix_kwargs=kwargs, unordered=True, chunksize=chunksize)
    generate_output_from_results(
        results, args.output, alphabet_info,
        batch_format=args.batch_format)


if __name__ == "__main__":
    main()
