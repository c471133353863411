#!/usr/bin/env python3
"""Speed-of-light analysis of the fused CRF lattice kernels, RNA-first.

The r4 RNA component split put CRF+logZ forward at 13.71 ms = 14% of the
step at L=1536 (double the DNA share): this probe bounds the fused
forward/backward lattice kernels (ops/pallas_crf.py) at the RNA
production shape the way misc/rnn_roofline.py bounds the LSTM backward.
Reference counterpart: the CRF is the reference's single most optimized
kernel (AVX2+OpenMP, /root/reference/taiyaki/ctc/c_crf_flipflop.c:43-78)
— same discipline owed here.

Rows (all measured on one v5e):
  analytic MXU    selection-dot FLOPs / 197 TF bf16
  analytic DMA    streamed bytes / 819 GB/s
  fwd no-lattice  shipped forward, lattice write elided (primal path)
  fwd full        shipped forward with the [T,B,L] bf16 residual
  bwd full        shipped backward (selection + walk + posterior scatter)
  logz fwd+bwd    the companion partition-function kernels at this shape
  tile sweep      (block_b, block_t) grid around the shipped tile

Usage: python misc/crf_roofline.py [--shape rna|dna] [--batch 256]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

MXU_BF16 = 197e12
HBM_BW = 819e9


def _barrier(out):
    """True execution barrier on remote-execution runtimes: fetch one
    scalar (block_until_ready is dispatch-only there — see
    docs/performance.md 'Timing on axon')."""
    import jax.numpy as jnp
    leaf = out[0] if isinstance(out, (tuple, list)) else out
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def bench(fn, *args, iters=20):
    _barrier(fn(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _barrier(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="rna", choices=["rna", "dna"])
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from taiyaki_tpu.ops import flipflop as ff
    from taiyaki_tpu.ops import pallas_crf, pallas_logz

    if args.shape == "rna":
        T, npos = 1600, 1500       # chunk 16000 / stride 10; seqs ~1500
    else:
        T, npos = 800, 480         # chunk 4000 / stride 5
    B, S = args.batch, 40
    L = npos + ((-npos) % 128)
    rng = np.random.default_rng(0)

    # valid flip-flop sequences -> indices, padded to L
    from taiyaki_tpu import flipflopfings
    seqs = np.stack([
        flipflopfings.flipflop_code(rng.integers(0, 4, npos), 4)
        for _ in range(B)])
    stay_idx, move_idx = ff.make_seq_indices(jnp.asarray(seqs), 4)
    pad = L - npos
    sidx = jnp.pad(stay_idx.astype(jnp.int32), [(0, 0), (0, pad)],
                   constant_values=S)
    midx = jnp.pad(move_idx.astype(jnp.int32), [(0, 0), (0, pad)],
                   constant_values=S)
    mmidx = jnp.full((B, L), S, jnp.int32)
    mmfact = jnp.zeros((B, L), jnp.float32)
    valid = jnp.asarray(
        np.arange(L)[None, :] < npos, jnp.int32) * jnp.ones(
            (B, 1), jnp.int32)
    lp = jnp.asarray(rng.normal(size=(T, B, S)), jnp.float32)

    bb, bt = pallas_crf.fused_tile(B, S + 1, L) or (16, 8)
    print("shape %s: T=%d B=%d S=%d L=%d  shipped tile bb=%d bt=%d"
          % (args.shape, T, B, S, L, bb, bt))

    # analytic floors
    flops = 2 * 2 * T * B * S * L                 # two [bt,S]x[S,L] dots/row
    bytes_fwd = T * B * S * 4 + T * B * L * 2     # lp f32 in, lattice bf16
    bytes_bwd = (T * B * S * 4 + T * B * L * 2    # lp + lattice in
                 + T * B * S * 4)                 # grad f32 out
    print("analytic  MXU %.3f ms   DMA fwd %.3f ms   DMA bwd %.3f ms"
          % (flops / MXU_BF16 * 1e3, bytes_fwd / HBM_BW * 1e3,
             bytes_bwd / HBM_BW * 1e3))

    def fwd(emit):
        f = jax.jit(functools.partial(
            pallas_crf.crf_forward_fused, block_b=bb, block_t=bt,
            emit_lattice=emit))
        return f

    f_nolat = fwd(False)
    t = bench(lambda: f_nolat(lp, sidx, midx, mmidx, mmfact, valid))
    print("fwd no-lattice (primal)   %7.3f ms" % (t * 1e3))

    f_full = fwd(True)
    t_fwd = bench(lambda: f_full(lp, sidx, midx, mmidx, mmfact, valid))
    print("fwd full (training)       %7.3f ms" % (t_fwd * 1e3))

    _, _, lattice = jax.block_until_ready(
        f_full(lp, sidx, midx, mmidx, mmfact, valid))
    fwd_final, score, _ = jax.block_until_ready(
        f_nolat(lp, sidx, midx, mmidx, mmfact, valid))
    # "last" seed for the backward: the int32 INDEX of each row's final
    # lattice position (production: clip(seqlens-1), ops/flipflop.py),
    # here npos-1 for every row so the move mask covers the full lattice
    last = jnp.full((B, 1), npos - 1, jnp.int32)
    f_bwd = jax.jit(functools.partial(
        pallas_crf.crf_backward_fused, block_b=bb, block_t=bt))
    t_bwd = bench(lambda: f_bwd(lp, sidx, midx, mmidx, mmfact, lattice,
                                valid, last))
    print("bwd full                  %7.3f ms" % (t_bwd * 1e3))

    # logZ companion at the same shape (scores lane-padded to 128)
    try:
        scores_p = jnp.pad(lp, [(0, 0), (0, 0), (0, 128 - S)],
                           constant_values=-1e30)
        lz_fwd = jax.jit(functools.partial(
            pallas_logz.logz_forward, nbase=4,
            block_t=pallas_logz.block_t_for(B)))
        t_lz = bench(lambda: lz_fwd(scores_p))
        print("logZ fwd                  %7.3f ms" % (t_lz * 1e3))
    except Exception as e:  # signature drift — report, don't die
        print("logZ probe skipped:", type(e).__name__, str(e)[:120])

    # tile sweep around the shipped tile
    print("tile sweep (fwd full / bwd full):")
    for bb_try in (8, 16, 32, 64):
        if B % bb_try:
            continue
        for bt_try in (4, 8, 16):
            if T % bt_try:
                continue
            try:
                f = jax.jit(functools.partial(
                    pallas_crf.crf_forward_fused, block_b=bb_try,
                    block_t=bt_try, emit_lattice=True))
                tf = bench(lambda: f(lp, sidx, midx, mmidx, mmfact,
                                     valid), iters=10)
                g = jax.jit(functools.partial(
                    pallas_crf.crf_backward_fused, block_b=bb_try,
                    block_t=bt_try))
                tg = bench(lambda: g(lp, sidx, midx, mmidx, mmfact,
                                     lattice, valid, last), iters=10)
                note = "  <- shipped" if (bb_try, bt_try) == (bb, bt) \
                    else ""
                print("  bb=%-3d bt=%-3d  fwd %7.3f ms  bwd %7.3f ms%s"
                      % (bb_try, bt_try, tf * 1e3, tg * 1e3, note))
            except Exception as e:
                print("  bb=%-3d bt=%-3d  FAILED (%s)"
                      % (bb_try, bt_try, type(e).__name__))


if __name__ == "__main__":
    main()
