#!/usr/bin/env python3
"""Speed-of-light analysis of the LSTM backward kernel (the train
step's dominant component: ~69% at bs256, docs/performance.md).

Measures, at the production layer shape (T=800 blocks, B=256, H=D=256,
the bench mLstm at chunk 4000):

  full       the shipped lstm_bwd_acts kernel (per-layer backward)
  chain      a probe kernel running ONLY the sequential critical path
             (cell elementwise + the dh = dpre @ sW chain dot) — the
             latency bound no amount of overlap can beat
  stream     a probe kernel that streams the same input blocks and
             writes the same outputs but does (almost) no math — the
             HBM/DMA bound
  analytic   MXU FLOPs / bf16 peak and HBM bytes / peak bandwidth

and prints where the measured kernel sits against max(bounds).

The MXU work per time row (4 dots of [B,4H]x[4H,H]-class) and the VPU
cell chain are interleaved on the same core; the chain dot is the only
MXU op on the dependence path, so

    SoL ~= max(chain-path time, total MXU time, DMA time)

Reference for the ethos: the reference optimizes its hot CUDA loop the
same way (taiyaki/cupy/, c_crf_flipflop.c); this is the TPU version.

Usage: python misc/rnn_roofline.py [--T 800] [--B 256] [--H 256]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e single-chip peaks (public: cloud.google.com/tpu/docs/v5e)
MXU_BF16 = 197e12          # FLOP/s
HBM_BW = 819e9             # B/s
VPU_F32 = 4 * 8 * 128 * 0.94e9   # 4 VPUs x (8,128) lanes x clock ~ 3.9 T/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=800)
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from taiyaki_tpu.ops import pallas_rnn as pr

    T, B, H = args.T, args.B, args.H
    D, H4 = H, 4 * H
    bt = pr.block_t_for(B)
    bb = pr.block_b_for(B)
    ngrid, nb = T // bt, B // bb
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=np.float32, scale=0.1):
        return jnp.asarray(rng.normal(size=shape).astype(dtype) * scale)

    bf = jnp.bfloat16
    dh = arr(T, B, H).astype(bf)
    acts = jax.nn.sigmoid(arr(T, B, H4, scale=1.0)).astype(bf)
    tc = jnp.tanh(arr(T, B, H, scale=1.0)).astype(bf)
    c_prev = arr(T, B, H).astype(bf)
    h = arr(T, B, H).astype(bf)
    x = arr(T, B, D).astype(bf)
    sW = arr(H4, H)
    iW = arr(H4, D)

    def timeit(fn, label):
        r = fn()
        float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn()
            float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print("%-22s %8.3f ms" % (label, best * 1e3), flush=True)
        return best * 1e3

    # ---- full shipped kernel ------------------------------------------------
    full_fn = jax.jit(functools.partial(
        pr.lstm_bwd_acts, block_t=bt, dx_dtype=bf, unroll=True))
    t_full = timeit(lambda: full_fn(dh, acts, tc, c_prev, h, x, sW, iW)[1],
                    "full lstm_bwd_acts")

    # ---- chain-only probe: the sequential critical path ---------------------
    # cell backward + chain dot only; streams dh/acts/tc/c_prev (no
    # h/x), writes only the final dh carry.  This is the latency floor
    # of the dependence chain itself.
    imap, order = pr._time_maps(ngrid, bt, descending=True)

    def chain_kernel(dh_ref, acts_ref, tc_ref, cprev_ref, sw_ref, out_ref,
                     dh_carry, dc_carry):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dh_carry[:] = jnp.zeros_like(dh_carry)
            dc_carry[:] = jnp.zeros_like(dc_carry)

        def body(j, _):
            k = order(j)
            dpre, dc_next = pr._lstm_cell_bwd_acts(
                dh_ref, acts_ref, tc_ref, cprev_ref, dh_carry, dc_carry,
                k, H)
            dh_carry[:] = jnp.dot(dpre, sw_ref[:],
                                  preferred_element_type=jnp.float32)
            dc_carry[:] = dc_next
            return 0

        pr.run_steps(body, bt, True)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = dh_carry[:]

    stream = lambda w: pl.BlockSpec((bt, bb, w), imap,
                                    memory_space=pltpu.VMEM)
    chain_fn = jax.jit(lambda *a: pl.pallas_call(
        chain_kernel,
        grid=(nb, ngrid),
        in_specs=[stream(H), stream(H4), stream(H), stream(H),
                  pl.BlockSpec((H4, H), pr._WMAP, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, H), lambda ib, it: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32)],
    )(*a))
    t_chain = timeit(lambda: chain_fn(dh, acts, tc, c_prev, sW),
                     "chain-only (critical)")

    # ---- stream-only probe: same blocks in/out, minimal math ----------------
    def stream_kernel(dh_ref, acts_ref, tc_ref, cprev_ref, h_ref, x_ref,
                      dx_ref, acc):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        acc[:] += (acts_ref[:, :, :H].astype(jnp.float32)
                   + tc_ref[:].astype(jnp.float32)
                   + cprev_ref[:].astype(jnp.float32)
                   + h_ref[:].astype(jnp.float32)
                   + dh_ref[:].astype(jnp.float32))
        dx_ref[:] = x_ref[:]

    stream_fn = jax.jit(lambda *a: pl.pallas_call(
        stream_kernel,
        grid=(nb, ngrid),
        in_specs=[stream(H), stream(H4), stream(H), stream(H), stream(H),
                  stream(D)],
        out_specs=pl.BlockSpec((bt, bb, D), imap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, D), bf),
        scratch_shapes=[pltpu.VMEM((bt, bb, H), jnp.float32)],
    )(*a))
    t_stream = timeit(lambda: stream_fn(dh, acts, tc, c_prev, h, x),
                      "stream-only (DMA)")

    # ---- analytic bounds -----------------------------------------------------
    flops_row = 2 * B * H4 * (D + H + D + H)    # dx + dsw + diw + chain
    t_mxu = T * flops_row / MXU_BF16 * 1e3
    # in: dh,tc,c_prev,h (H) + acts (4H) + x (D) bf16; out: dx (D) bf16
    #     + dsw/diw/db f32 once per tile (negligible)
    bytes_total = T * B * 2 * (4 * H + H4 + D + D)
    t_dma = bytes_total / HBM_BW * 1e3
    # cell chain: ~22 f32 vector ops on [B, H] per gate-group equivalent
    # (~5.5 ops/element on [B, 4H])
    vpu_ops = T * B * H4 * 5.5
    t_vpu = vpu_ops / VPU_F32 * 1e3

    print()
    print("analytic  MXU %6.3f ms   DMA %6.3f ms   VPU(cell) %6.3f ms"
          % (t_mxu, t_dma, t_vpu))
    sol = max(t_chain, t_mxu, t_dma)
    print("SoL = max(chain %.3f, MXU %.3f, DMA %.3f) = %.3f ms"
          % (t_chain, t_mxu, t_dma, sol))
    print("measured full kernel:  %.3f ms  ->  %.0f%% of speed-of-light"
          % (t_full, 100 * sol / t_full))
    print("5-layer extrapolation: %.2f ms measured vs %.2f ms SoL"
          % (5 * t_full, 5 * sol))


if __name__ == "__main__":
    main()
