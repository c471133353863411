#!/usr/bin/env python3
"""Predict expected current (squiggle) from sequence
(reference: bin/predict_squiggle.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.utils.cmdargs import FileExists  # noqa: E402
from taiyaki_tpu.utils.common_cmdargs import add_common_command_args  # noqa


def get_parser():
    parser = argparse.ArgumentParser(
        description="Predict squiggle from sequence",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_command_args(parser, "output version".split())
    parser.add_argument("model", action=FileExists, help="Squiggle-model checkpoint")
    parser.add_argument("input", action=FileExists, help="Fasta of sequences to predict from")
    return parser


def main():
    args = get_parser().parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from taiyaki_tpu.bio import iter_fasta
    from taiyaki_tpu.ops.squiggle import embed_sequence
    from taiyaki_tpu.utils import helpers

    net, params, _, _, _, _ = helpers.load_model(args.model)
    if params is None:
        sys.exit("* Error: pass a trained .checkpoint")

    with helpers.open_file_or_stdout(args.output) as fh:
        with open(args.input) as in_fh:
            for name, seq in iter_fasta(in_fh):
                embedded = embed_sequence(seq)[:, None, :]
                squiggle = np.asarray(
                    net.apply(params, embedded))[:, 0, :]
                fh.write("base\tcurrent\tsd\tdwell\n")
                for base, (mean, logsd, dwell) in zip(seq, squiggle):
                    fh.write("{}\t{}\t{}\t{}\n".format(
                        base, mean, np.exp(logsd), np.exp(-dwell)))


if __name__ == "__main__":
    main()
