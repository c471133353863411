#!/usr/bin/env python3
"""On-chip component split of the train step by ablation.

Times jitted sub-programs that each stop at a different depth of the
step (device-resident inputs, scalar-fetch barrier, best of 3 windows)
so successive differences attribute time to components.  Stages:

  fwd        network forward only
  loss_fwd   + CRF loss value + logZ (no gradients)
  grads      + full backward (value_and_grad)
  step       + clip + AdamW update (the real train step)

plus a backward SUB-split (r4) that attributes "backward (all)" between
the network and the loss:

  net_grads  grad of net.apply(params, sig).sum() — network fwd + bwd
             with a trivial cotangent (same backward compute shape as
             the real step)
  crf_fwd    CRF loss + logZ from PRECOMPUTED scores (no network)
  crf_grads  + its backward — d(loss)/d(scores)

so network bwd = net_grads - fwd, CRF+logZ bwd = crf_grads - crf_fwd,
and the residual vs "backward (all)" is scheduling glue/overlap (can be
negative when XLA overlaps the pieces in the combined program).

Usage: python misc/component_split.py [--batch 256] [--shape dna|rna]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--shape", default="dna")
    ap.add_argument("--model", default="mLstm")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=0,
                    help="override chunk_len (0 = production shape); "
                         "tiny values smoke-test the probe on CPU")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from taiyaki_tpu import train
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "misc"))
    from ab_train_variants import make_batch

    rna = args.shape == "rna"
    chunk_len = args.chunk or (16000 if rna else 4000)
    stride = 10 if rna else 5
    winlen = 31 if rna else 19
    cat_mod = args.model.endswith("_cat_mod")
    if args.model.startswith("mGru"):
        from taiyaki_tpu.models import mGru_cat_mod_flipflop, mGru_flipflop
        model_mod = mGru_cat_mod_flipflop if cat_mod else mGru_flipflop
        if not rna:
            stride = 2
    else:
        from taiyaki_tpu.models import (mLstm_cat_mod_flipflop,
                                        mLstm_flipflop)
        model_mod = mLstm_cat_mod_flipflop if cat_mod else mLstm_flipflop

    if cat_mod:
        from taiyaki_tpu.alphabet import AlphabetInfo
        ai = AlphabetInfo("ACGTZ", "ACGTC", ["5mC"], do_reorder=True)
        net = model_mod.network(size=256, stride=stride, winlen=winlen,
                                alphabet_info=ai)
        head = net.sublayers[-1]
        cmo = head.can_mods_offsets
        mcw = np.ones(head.ncan_base + head.nmod_base, np.float32)
    else:
        net = model_mod.network(size=256, stride=stride, winlen=winlen)
        cmo = mcw = None
    params = jax.device_put(net.init(np.random.default_rng(0)))
    opt, _ = train.make_optimizer(lr_max=4e-3, niteration=1000,
                                  warmup_batches=10, lr_warmup=1e-4,
                                  lr_min=1e-4)
    opt_state = jax.device_put(opt.init(params))
    batch = make_batch(train, np.random.default_rng(0), chunk_len,
                       stride, args.batch)
    if cat_mod:
        # ~20% of positions modified (uniform over the 5-letter alphabet)
        rngm = np.random.default_rng(1)
        mod_cats = np.where(
            (np.asarray(batch.seqs) % 4 == 1)
            & (rngm.random(batch.seqs.shape) < 0.25), 1, 0).astype(np.int32)
        batch = train.Batch(batch.signal, batch.seqs, batch.seqlens,
                            jnp.asarray(mod_cats))
    batch = train.Batch(*[jax.device_put(a) if a is not None else None
                          for a in batch])
    loss_fn = train.make_loss_fn(net, cat_mod, cmo, mcw)
    nleaves = len(jax.tree.leaves(params))
    threshs = jnp.full(nleaves, jnp.inf, jnp.float32)

    @jax.jit
    def fwd(params, batch):
        return net.apply(params, batch.signal).sum()

    @jax.jit
    def loss_fwd(params, batch):
        return loss_fn(params, batch, 1.0, 1.0)

    @jax.jit
    def grads(params, batch):
        loss, g = jax.value_and_grad(
            lambda p: loss_fn(p, batch, 1.0, 1.0))(params)
        return loss + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    # -- backward sub-split pieces (see module docstring) --
    from taiyaki_tpu.ops import flipflop as ffops

    def crf_from_scores(outputs):
        nblk, ntrans = outputs.shape[0], outputs.shape[2]
        if cat_mod:
            ntrans = ntrans - int(cmo[-1])
            lossvector = ffops.cat_mod_flipflop_loss(
                outputs, batch.seqs, batch.seqlens, batch.mod_cats,
                cmo, mcw, 1.0)
        else:
            lossvector = ffops.crf_flipflop_loss(
                outputs, batch.seqs, batch.seqlens, 1.0)
        logz = ffops.flipflop_logz(outputs[:, :, :ntrans]) / nblk
        lossvector = lossvector + jnp.where(batch.seqlens > 0, logz, 0.0)
        return jnp.sum(lossvector) / jnp.maximum(
            jnp.sum(batch.seqlens > 0), 1)

    scores0 = jax.jit(lambda p: net.apply(p, batch.signal))(params)
    scores0 = jax.block_until_ready(scores0)

    @jax.jit
    def net_grads(params, batch):
        v, g = jax.value_and_grad(
            lambda p: net.apply(p, batch.signal).sum())(params)
        return v + sum(jnp.sum(x) for x in jax.tree.leaves(g))

    @jax.jit
    def crf_fwd(scores):
        return crf_from_scores(scores)

    @jax.jit
    def crf_grads(scores):
        v, g = jax.value_and_grad(crf_from_scores)(scores)
        return v + jnp.sum(g)

    step_fn = train.jit_train_step(
        train.make_train_step(net, opt, cat_mod, cmo, mcw), mesh=None)

    def run_step():
        nonlocal params, opt_state
        params, opt_state, loss, _ = step_fn(params, opt_state, batch,
                                             1.0, 1.0, threshs)
        return loss

    stages = [("fwd", lambda: fwd(params, batch)),
              ("loss_fwd", lambda: loss_fwd(params, batch).sum()),
              ("grads", lambda: grads(params, batch)),
              ("net_grads", lambda: net_grads(params, batch)),
              ("crf_fwd", lambda: crf_fwd(scores0)),
              ("crf_grads", lambda: crf_grads(scores0)),
              ("step", run_step)]
    times = {}
    for name, fn in stages:
        float(fn())                      # compile + barrier
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn()
            float(r)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        times[name] = best * 1e3
        print("%-9s %7.2f ms" % (name, times[name]), flush=True)
    print("-- differences --")
    print("network fwd          %7.2f ms" % times["fwd"])
    print("CRF+logZ fwd         %7.2f ms" % (times["loss_fwd"] - times["fwd"]))
    print("backward (all)       %7.2f ms" % (times["grads"] - times["loss_fwd"]))
    print("optimizer/clip/misc  %7.2f ms" % (times["step"] - times["grads"]))
    net_bwd = times["net_grads"] - times["fwd"]
    crf_bwd = times["crf_grads"] - times["crf_fwd"]
    print("-- backward sub-split --")
    print("network bwd          %7.2f ms  (net_grads - fwd)" % net_bwd)
    print("CRF+logZ bwd         %7.2f ms  (crf_grads - crf_fwd; crf_fwd "
          "standalone %.2f)" % (crf_bwd, times["crf_fwd"]))
    print("glue/overlap resid   %7.2f ms  (backward-all - pieces)"
          % (times["grads"] - times["loss_fwd"] - net_bwd - crf_bwd))
    print("total step           %7.2f ms  (%.0f chunks/s)"
          % (times["step"], args.batch / times["step"] * 1e3))


if __name__ == "__main__":
    main()
