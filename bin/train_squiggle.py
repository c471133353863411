#!/usr/bin/env python3
"""Train a squiggle predictor (sequence -> expected current)
(reference: bin/train_squiggle.py)."""

import argparse
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.utils.cmdargs import (  # noqa: E402
    AutoBool, FileExists, Maybe, Positive, proportion)
from taiyaki_tpu.utils.common_cmdargs import add_common_command_args  # noqa


def get_parser():
    parser = argparse.ArgumentParser(
        description="Train a model to predict ionic current levels from "
                    "sequence",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_command_args(
        parser, """adam device eps filter_max_dwell filter_mean_dwell limit
        niteration outdir overwrite quiet reverse save_every
        sample_nreads_before_filtering version weight_decay""".split())
    parser.add_argument(
        "--batch_size", default=100, metavar="chunks", type=Positive(int),
        help="Chunks per training batch")
    parser.add_argument(
        "--back_prob", default=1e-15, metavar="probability",
        type=proportion, help="Chance of a backward step in the alignment")
    parser.add_argument(
        "--depth", metavar="layers", default=4, type=Positive(int),
        help="Depth of the residual convolution stack")
    parser.add_argument(
        "--filter_path_buffer", default=1.1, metavar="ratio", type=float,
        help="Drop chunks with small ratio of signal length to bases")
    parser.add_argument(
        "--filter_min_pass_fraction", default=0.5, metavar="fraction",
        type=Maybe(Positive(float)),
        help="Abort when the chunk-filter pass rate falls below this fraction")
    parser.add_argument(
        "--full_filter_status", default=False, action=AutoBool,
        help="Output full chunk filtering statistics.")
    parser.add_argument(
        "--input_strand_list", default=None, action=FileExists,
        help="Strand summary file containing column read_id.")
    parser.add_argument(
        "--lr_decay", default=5000, metavar="n", type=Positive(float),
        help="Decay scale n: batch i trains at lr_max / (1 + i/n)")
    parser.add_argument(
        "--lr_max", default=1.0e-4, metavar="rate", type=Positive(float),
        help="Learning rate at step 0 (the maximum)")
    parser.add_argument(
        "--seed", default=None, metavar="integer", type=Positive(int),
        help="Seed for all RNGs (parameter init and data order)")
    parser.add_argument(
        "--size", metavar="n", default=32, type=Positive(int),
        help="Channels per convolution layer")
    parser.add_argument(
        "--target_len", metavar="n", default=300, type=Positive(int),
        help="Sequence length to cut references into")
    parser.add_argument(
        "--winlen", metavar="n", default=9, type=Positive(int),
        help="Convolution kernel width")
    parser.add_argument(
        "input", action=FileExists, help="Mapped-signal HDF5 with the training data")
    return parser


def create_convolution(size, depth, winlen):
    """Conv(3->size) + depth residual convs + Conv(size->3)
    (reference: bin/train_squiggle.py:86-94)."""
    from taiyaki_tpu import activation, layers
    return layers.Serial(
        [layers.Convolution(3, size, winlen, stride=1, fun=activation.tanh)]
        + [layers.Residual(layers.Convolution(size, size, winlen, stride=1,
                                              fun=activation.tanh))
           for _ in range(depth)]
        + [layers.Convolution(size, 3, winlen, stride=1,
                              fun=activation.linear)])


MODEL_SOURCE_TMPL = """\
from taiyaki_tpu import activation, layers


def network(size={size}, depth={depth}, winlen={winlen}, **kwargs):
    return layers.Serial(
        [layers.Convolution(3, size, winlen, stride=1, fun=activation.tanh)]
        + [layers.Residual(layers.Convolution(
               size, size, winlen, stride=1, fun=activation.tanh))
           for _ in range({depth})]
        + [layers.Convolution(size, 3, winlen, stride=1,
                              fun=activation.linear)])
"""


def main():
    args = get_parser().parse_args()
    import jax
    from taiyaki_tpu.utils.helpers import select_jax_platform
    select_jax_platform(args.device)
    import jax.numpy as jnp
    import optax

    from taiyaki_tpu.constants import DOTROWLENGTH, MODEL_LOG_FILENAME
    from taiyaki_tpu.data import chunk_selection, mapped_signal_files
    from taiyaki_tpu.data.signal_mapping import Chunk
    from taiyaki_tpu.ops.squiggle import embed_sequence, squiggle_match_cost
    from taiyaki_tpu.utils import helpers

    seed = np.random.randint(2 ** 31) if args.seed is None else args.seed
    np.random.seed(seed)
    rng = np.random.default_rng(seed)

    helpers.prepare_outdir(args.outdir, args.overwrite)
    log = helpers.Logger(os.path.join(args.outdir, MODEL_LOG_FILENAME),
                         args.quiet)
    log.write(helpers.formatted_env_info(args.device))

    with mapped_signal_files.MappedSignalReader(args.input) as msr:
        alphabet_info = msr.get_alphabet_information()
        assert alphabet_info.nbase == 4, (
            "Squiggle prediction with modified base training data is not "
            "currently supported.")
        if args.input_strand_list is not None:
            from taiyaki_tpu.utils.fileio import readtsv
            read_ids = list(readtsv(args.input_strand_list,
                                    ["read_id"])["read_id"])
            log.write("* Will train from a subset of {} strands\n".format(
                len(read_ids)))
        else:
            read_ids = None
        # islice: never materialize the whole file before --limit
        from itertools import islice
        read_data = list(islice(msr.reads(read_ids), args.limit))
    if len(read_data) == 0:
        log.write("* No reads remaining for training, exiting.\n")
        sys.exit(1)
    log.write("* Loaded {} reads.\n".format(len(read_data)))

    filter_params = chunk_selection.sample_filter_parameters(
        read_data, args.sample_nreads_before_filtering, args.target_len,
        args.filter_mean_dwell, args.filter_max_dwell,
        args.filter_min_pass_fraction, 1, args.filter_path_buffer,
        chunk_len_means_sequence_len=True)
    log.write("* Sampled chunks: median(mean_dwell)={:.2f}, "
              "mad(mean_dwell)={:.2f}\n".format(
                  filter_params.median_meandwell,
                  filter_params.mad_meandwell))

    net = create_convolution(args.size, args.depth, args.winlen)
    params = net.init(rng)
    model_source = MODEL_SOURCE_TMPL.format(
        size=args.size, depth=args.depth, winlen=args.winlen)
    metadata = {"reverse": args.reverse, "standardize": True, "version": 3}
    log.write("* Created network.\n* Depth {} layers ({} residual layers)\n"
              "* Window width {}\n".format(args.depth + 2, args.depth,
                                           args.winlen))

    # Static max signal length per chunk: dwell filter bounds sig_len.
    # --filter_mean_dwell None disables the filter; bound the static
    # shape generously from the sampled dwell stats instead.
    dwell_mads = (10.0 if args.filter_mean_dwell is None
                  else args.filter_mean_dwell)
    max_dwell = (filter_params.median_meandwell
                 + dwell_mads * filter_params.mad_meandwell)
    max_siglen = int(np.ceil(args.target_len * max_dwell / 256.0)) * 256

    schedule = lambda i: args.lr_max * args.lr_decay / (i + args.lr_decay)  # noqa: E731
    opt = optax.adamw(schedule, b1=args.adam[0], b2=args.adam[1],
                      eps=args.eps, weight_decay=args.weight_decay)
    opt_state = opt.init(params)

    def loss_fn(p, seq_embed, signals, siglens, valid):
        pred = net.apply(p, seq_embed)
        costs = squiggle_match_cost(pred, signals, siglens, args.back_prob)
        # padded (repeated) columns carry weight 0 so short batches match
        # the reference's sum(costs)/sum(siglens) over REAL chunks only
        return jnp.sum(costs * valid) / jnp.sum(siglens * valid)

    @jax.jit
    def train_step(p, opt_state, seq_embed, signals, siglens, valid):
        loss, grads = jax.value_and_grad(loss_fn)(
            p, seq_embed, signals, siglens, valid)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    revop = np.flip if args.reverse else np.asarray
    score_smoothed = helpers.WindowedExpSmoother()
    rejection_dict = defaultdict(int)
    t0 = time.time()
    log.write("* Training\n")
    for i in range(args.niteration):
        chunk_batch, rejections = chunk_selection.sample_chunks(
            read_data, args.batch_size, args.target_len, filter_params,
            chunk_len_means_sequence_len=True)
        for k, v in rejections.items():
            rejection_dict[k] += v
        chunk_batch = [c for c in chunk_batch if c.sig_len <= max_siglen]
        if len(chunk_batch) == 0:
            log.write("* Warning: no usable chunks this iteration\n")
            continue
        n = len(chunk_batch)
        seq_embed = np.zeros((args.target_len, n, 3), dtype=np.float32)
        signals = np.zeros((max_siglen, n), dtype=np.float32)
        siglens = np.zeros(n, dtype=np.int32)
        for j, chunk in enumerate(chunk_batch):
            seq_embed[:, j] = embed_sequence(revop(chunk.sequence),
                                             alphabet=None)
            signals[:chunk.sig_len, j] = revop(chunk.current)
            siglens[j] = chunk.sig_len
        # pad batch to static size; padded columns get loss weight 0
        valid = np.ones(args.batch_size, dtype=np.float32)
        if n < args.batch_size:
            reps = [j % n for j in range(args.batch_size - n)]
            seq_embed = np.concatenate([seq_embed, seq_embed[:, reps]], 1)
            signals = np.concatenate([signals, signals[:, reps]], 1)
            siglens = np.concatenate([siglens, siglens[reps]])
            valid[n:] = 0.0
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(seq_embed), jnp.asarray(signals),
            jnp.asarray(siglens), jnp.asarray(valid))
        score_smoothed.update(float(loss))

        if (i + 1) % args.save_every == 0:
            helpers.save_model(args.outdir, net, params, model_source, {},
                               metadata, (i + 1) // args.save_every)
            log.write("C")
        else:
            log.write(".")
        if (i + 1) % DOTROWLENGTH == 0:
            dt = time.time() - t0
            log.write(" {:5d} {:7.5f}  {:5.2f}s".format(
                (i + 1) // DOTROWLENGTH, score_smoothed.value, dt))
            n_tot = sum(rejection_dict.values())
            n_fail = n_tot - rejection_dict[Chunk.rej_str_pass]
            if args.full_filter_status:
                for k, v in rejection_dict.items():
                    log.write(" {}:{} ".format(k, v))
            else:
                log.write("  {:.1%} chunks filtered".format(
                    n_fail / max(n_tot, 1)))
            log.write("\n")
            t0 = time.time()

    helpers.save_model(args.outdir, net, params, model_source, {}, metadata)


if __name__ == "__main__":
    main()
