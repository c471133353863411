#!/usr/bin/env python3
"""Map observed signal to a predicted squiggle via DTW Viterbi
(reference: bin/map_to_squiggle.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.utils.cmdargs import (  # noqa: E402
    FileExists, Maybe, NonNegative, proportion)
from taiyaki_tpu.utils.common_cmdargs import add_common_command_args  # noqa


def get_parser():
    parser = argparse.ArgumentParser(
        description="Map sequence to current trace using squiggle "
                    "predictor model",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_command_args(parser,
                            "limit jobs output recursive version".split())
    parser.add_argument(
        "--back_prob", default=1e-15, metavar="probability",
        type=proportion, help="Chance of a backward step in the alignment")
    parser.add_argument(
        "--input_strand_list", default=None, action=FileExists,
        help="TSV (read_id column) restricting which reads are used")
    parser.add_argument(
        "--localpen", default=None, type=Maybe(NonNegative(float)),
        help="Cost of dwelling in the flanking start/end states; None to "
             "disable them")
    parser.add_argument(
        "--minscore", default=None, type=Maybe(NonNegative(float)),
        help="Score floor for accepting a match")
    parser.add_argument(
        "--trim", default=(200, 10), nargs=2, type=NonNegative(int),
        metavar=("beginning", "end"),
        help="Samples to discard at the read start and end")
    parser.add_argument("model", action=FileExists, help="Squiggle-model checkpoint")
    parser.add_argument("references", action=FileExists, help="Fasta of sequences to map against")
    parser.add_argument("read_dir", action=FileExists,
                        help="Directory of fast5 read files")
    return parser


def main():
    args = get_parser().parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from taiyaki_tpu.bio import fasta_file_to_dict
    from taiyaki_tpu.data import fast5utils
    from taiyaki_tpu.maths import mad
    from taiyaki_tpu.ops.squiggle import (
        embed_sequence, squiggle_match_viterbi_path)
    from taiyaki_tpu.utils import helpers

    net, params, _, _, _, _ = helpers.load_model(args.model)
    if params is None:
        sys.exit("* Error: pass a trained .checkpoint")
    references = fasta_file_to_dict(args.references, filter_ambig=False)

    fast5_reads = fast5utils.iterate_fast5_reads(
        args.read_dir, limit=args.limit,
        strand_list=args.input_strand_list, recursive=args.recursive)

    with helpers.open_file_or_stdout(args.output) as fh:
        for fast5_name, read_id in fast5_reads:
            refseq = references.get(read_id)
            if refseq is None:
                sys.stderr.write("Reference not found for {}\n"
                                 .format(read_id))
                continue
            try:
                with fast5utils.get_fast5_file(fast5_name) as f5:
                    signal = f5.get_read(read_id).get_raw_data()
            except Exception:
                sys.stderr.write("Error reading {}\n".format(read_id))
                continue
            t0, t1 = args.trim
            signal = signal[t0:len(signal) - t1]
            if len(signal) == 0:
                continue
            norm_sig = ((signal - np.median(signal))
                        / mad(signal)).astype(np.float32)
            embedded = embed_sequence(refseq)[:, None, :]
            squiggle_params = np.asarray(
                net.apply(params, embedded))[:, 0, :]
            score, path = squiggle_match_viterbi_path(
                squiggle_params, norm_sig, args.back_prob, args.localpen,
                args.minscore)
            fh.write("#{} {}\n".format(read_id, -score))
            for i, (s, p) in enumerate(zip(norm_sig, path)):
                base = refseq[p] if p >= 0 else "-"
                sp = squiggle_params[p] if p >= 0 else (0.0, 0.0, 0.0)
                fh.write("{}\t{}\t{}\t{}\t{}\t{}\t{}\t{}\n".format(
                    read_id, i, s, p, base, sp[0], sp[1], sp[2]))


if __name__ == "__main__":
    main()
