#!/usr/bin/env python3
"""Ab-initio (bootstrap) training from fixed-length chunks + fasta refs
(reference: bin/train_abinitio.py)."""

import argparse
import os
import pickle
import sys
import time
from shutil import copyfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.utils.cmdargs import (  # noqa: E402
    FileExists, Maybe, NonNegative, Positive)
from taiyaki_tpu.utils.common_cmdargs import add_common_command_args  # noqa


def get_parser():
    parser = argparse.ArgumentParser(
        description="Train a flip-flop neural network ab initio",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_command_args(
        parser, """adam alphabet device eps limit niteration outdir
        overwrite quiet save_every version weight_decay""".split())
    parser.add_argument(
        "--batch_size", default=128, metavar="chunks", type=Positive(int),
        help="Chunks per training batch")
    parser.add_argument(
        "--gradient_cap_fraction", default=0.05, metavar="f",
        type=Maybe(NonNegative(float)),
        help="Bound the gradient L2 norm so that a fraction f of steps "
             "are capped. Use None for no capping.")
    parser.add_argument(
        "--lr_max", default=4.0e-3, metavar="rate", type=Positive(float),
        help="Learning rate at step 0")
    parser.add_argument(
        "--size", default=96, metavar="neurons", type=Positive(int),
        help="Width (hidden units) of the network layers")
    parser.add_argument(
        "--seed", default=None, metavar="integer", type=Positive(int),
        help="Seed for all RNGs (parameter init and data order)")
    parser.add_argument(
        "--stride", default=2, metavar="samples", type=Positive(int),
        help="Downsampling stride of the convolution front end")
    parser.add_argument(
        "--winlen", default=19, type=Positive(int),
        help="Convolution front-end window width in samples")
    parser.add_argument("model", action=FileExists,
                        help="Python file defining the network to train")
    parser.add_argument("chunks", action=FileExists,
                        help="HDF5 of fixed-length signal chunks")
    parser.add_argument("reference", action=FileExists,
                        help="fasta of the per-chunk sequences")
    return parser


def convert_seq(s, alphabet):
    """Sequence string -> flip-flop codes."""
    from taiyaki_tpu import flipflopfings
    lut = {b: i for i, b in enumerate(alphabet)}
    buf = np.array([lut[b] for b in s], dtype=np.int32)
    return flipflopfings.flipflop_code(buf, len(alphabet))


def main():
    args = get_parser().parse_args()
    import jax
    from taiyaki_tpu.utils.helpers import select_jax_platform
    select_jax_platform(args.device)
    import h5py
    import jax.numpy as jnp
    import optax

    from taiyaki_tpu import alphabet as alphabet_mod
    from taiyaki_tpu import train
    from taiyaki_tpu.bio import iter_fasta
    from taiyaki_tpu.constants import MODEL_LOG_FILENAME
    from taiyaki_tpu.maths import RollingQuantile
    from taiyaki_tpu.utils import helpers

    np.random.seed(args.seed)
    rng = np.random.default_rng(args.seed)
    helpers.prepare_outdir(args.outdir, args.overwrite)
    copyfile(args.model, os.path.join(args.outdir, "model.py"))
    log = helpers.Logger(os.path.join(args.outdir, MODEL_LOG_FILENAME),
                         args.quiet)
    log.write(helpers.formatted_env_info(args.device))
    log.write("* Loading data from {}\n".format(args.chunks))
    log.write("* Per read file MD5 {}\n".format(helpers.file_md5(
        args.chunks)))

    with h5py.File(args.chunks, "r", libver="v108") as h5:
        chunks = h5["chunks"][:args.limit]
    log.write("* Loaded {} chunks from {}.\n".format(len(chunks),
                                                     args.chunks))

    if os.path.splitext(args.reference)[1] == ".pkl":
        with open(args.reference, "rb") as fh:
            seq_dict = pickle.load(fh)
        log.write("* Loaded preprocessed references from {}.\n".format(
            args.reference))
    else:
        with open(args.reference) as fh:
            seq_dict = {int(name): convert_seq(seq, args.alphabet)
                        for name, seq in iter_fasta(fh)}
        log.write("* Loaded references from {}.\n".format(args.reference))
        pickle_name = os.path.splitext(args.reference)[0] + ".pkl"
        with open(pickle_name, "wb") as fh:
            pickle.dump(seq_dict, fh)
        log.write("* Written pickle of processed references to {} for "
                  "future use.\n".format(pickle_name))

    log.write("* Reading network from {}\n".format(args.model))
    alphabet_info = alphabet_mod.AlphabetInfo(args.alphabet, args.alphabet)
    model_kwargs = {"size": args.size, "stride": args.stride,
                    "winlen": args.winlen, "insize": 1,
                    "alphabet_info": alphabet_info}
    metadata = {"reverse": False, "standardize": True}
    net, params, model_source, metadata, model_kwargs, _ = \
        helpers.load_model(args.model, model_metadata=metadata,
                           **model_kwargs)
    if params is None:
        params = net.init(rng)

    schedule = optax.cosine_decay_schedule(args.lr_max, args.niteration)
    opt = optax.adamw(schedule, b1=args.adam[0], b2=args.adam[1],
                      eps=args.eps, weight_decay=args.weight_decay)
    opt_state = opt.init(params)

    # Static padded sequence length across the dataset.
    max_seqlen = max(len(s) for s in seq_dict.values())
    loss_fn = train.make_loss_fn(net)

    @jax.jit
    def train_step(params, opt_state, batch, grad_cap):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, 1.0, 1.0)
        # global L2 norm cap (reference: clip_grad_norm_ at rolling quantile)
        leaves = jax.tree.leaves(grads)
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
        scale = jnp.minimum(1.0, grad_cap / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, gnorm

    score_smoothed = helpers.WindowedExpSmoother()
    log.write("* Dumping initial model\n")
    helpers.save_model(args.outdir, net, params, model_source, model_kwargs,
                       metadata, 0)

    grad_cap = 1e30
    rolling_quantile = None
    if args.gradient_cap_fraction is None:
        log.write("* No gradient capping\n")
    else:
        rolling_quantile = RollingQuantile(args.gradient_cap_fraction)
        log.write("* Gradient L2 norm cap will be upper {:3.2f} quantile "
                  "of the last {} norms.\n".format(
                      args.gradient_cap_fraction, rolling_quantile.window))

    total_bases = total_samples = 0
    t0 = time.time()
    log.write("* Training\n")
    for i in range(args.niteration):
        idx = np.random.choice(len(chunks), size=args.batch_size,
                               replace=False)
        indata = chunks[idx].T[..., np.newaxis].astype(np.float32)
        seqs = np.zeros((args.batch_size, max_seqlen), dtype=np.int32)
        seqlens = np.zeros(args.batch_size, dtype=np.int32)
        for j, ci in enumerate(idx):
            s = seq_dict[ci]
            seqs[j, :len(s)] = s
            seqlens[j] = len(s)
        batch = train.Batch(jnp.asarray(indata), jnp.asarray(seqs),
                            jnp.asarray(seqlens), None)
        params, opt_state, loss, gnorm = train_step(
            params, opt_state, batch, grad_cap)
        if rolling_quantile is not None:
            grad_cap = rolling_quantile.update(float(gnorm))
        score_smoothed.update(float(loss))
        total_bases += int(seqlens.sum())
        total_samples += indata.size

        if (i + 1) % args.save_every == 0:
            helpers.save_model(args.outdir, net, params, model_source,
                               model_kwargs, metadata,
                               (i + 1) // args.save_every)
            log.write("C")
        else:
            log.write(".")
        if (i + 1) % 50 == 0:
            dt = time.time() - t0
            log.write(
                " {:5d} {:7.5f}  {:5.2f}s ({:.2f} ksample/s {:.2f} "
                "kbase/s) lr={:.2e}\n".format(
                    (i + 1) // 50, score_smoothed.value, dt,
                    total_samples / 1000.0 / dt, total_bases / 1000.0 / dt,
                    float(schedule(i))))
            total_bases = total_samples = 0
            t0 = time.time()

    helpers.save_model(args.outdir, net, params, model_source, model_kwargs,
                       metadata)


if __name__ == "__main__":
    main()
