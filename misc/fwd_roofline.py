#!/usr/bin/env python3
"""Speed-of-light analysis of the fused-gates LSTM FORWARD kernel.

Companion to misc/rnn_roofline.py (the backward probe): the network
forward is ~24% of the train step (docs/performance.md component split)
and most of it is the five lstm_fused_fwd kernels, so this pins where
the shipped forward sits against its achievable bounds at the
production layer shape (T=800, B=256, H=D=256, bt=2/bb=256).

Probes (all on one v5e, production config: emit="acts" residuals,
bf16 streams, DEFAULT matmul precision, unroll=True):

  full        the shipped lstm_fused_fwd kernel
  mxu+cell    compute-only: per-block gate GEMM + per-row chain dot +
              cell, resident blocks (no HBM streaming) — the MXU
              serialization floor including the VPU cell
  chain-only  per-row chain dot + cell only, resident (no gate GEMM) —
              the sequential critical path
  cell-only   the VPU cell alone, resident, no dots — is the cell
              hidden under the MXU?
  stream      same blocks in/out, (almost) no math — achievable DMA
  analytic    MXU FLOPs / bf16 peak, HBM bytes / peak BW

Reference ethos: taiyaki/cupy kernels + c_crf_flipflop.c hot-loop
accounting; this is the TPU forward version.

Usage: python misc/fwd_roofline.py [--T 800] [--B 256] [--H 256]
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
    x = arr(T, B, D).astype(bf)
    iW = arr(H4, D)
    b = arr(H4)
    sW = arr(H4, H)
    gx = arr(T, B, H4).astype(bf)

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

    # ---- full shipped kernel (production config) ----------------------------
    full_fn = jax.jit(lambda xx: pr.lstm_fused_fwd(
        xx, iW, b, sW, block_t=bt, residual_dtype=bf, h_dtype=bf,
        emit="acts", unroll=True)[0])
    t_full = timeit(lambda: full_fn(x), "full lstm_fused_fwd")

    imap, order = pr._time_maps(ngrid, bt, descending=False)
    resident = lambda w: pl.BlockSpec((bt, bb, w), lambda ib, it: (0, 0, 0),
                                      memory_space=pltpu.VMEM)
    stream = lambda w: pl.BlockSpec((bt, bb, w), imap,
                                    memory_space=pltpu.VMEM)
    wspec = lambda r, c: pl.BlockSpec((r, c), pr._WMAP,
                                      memory_space=pltpu.VMEM)
    out_final = pl.BlockSpec((bb, H), lambda ib, it: (ib, 0),
                             memory_space=pltpu.VMEM)

    def cell(pre, h_carry, c_carry):
        i = jax.nn.sigmoid(pre[:, :H])
        f = jax.nn.sigmoid(pre[:, H:2 * H])
        g = jnp.tanh(pre[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(pre[:, 3 * H:])
        c2 = f * c_carry[:] + i * g
        h2 = o * jnp.tanh(c2)
        h_carry[:] = h2
        c_carry[:] = c2

    # ---- compute-only: gate GEMM + chain dot + cell, resident ---------------
    def mxu_cell_kernel(x_ref, iwt_ref, b_ref, swt_ref, out_ref,
                        h_carry, c_carry, gx_scratch):
        @pl.when(pl.program_id(1) == 0)
        def _():
            h_carry[:] = jnp.zeros_like(h_carry)
            c_carry[:] = jnp.zeros_like(c_carry)

        pr._fused_gates(x_ref, iwt_ref, b_ref, gx_scratch, bt, None)

        def body(j, _):
            k = order(j)
            pre = gx_scratch[k] + jnp.dot(
                h_carry[:], swt_ref[:], preferred_element_type=jnp.float32)
            cell(pre, h_carry, c_carry)
            return 0

        pr.run_steps(body, bt, True)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = h_carry[:]

    mxu_cell_fn = jax.jit(lambda *a: pl.pallas_call(
        mxu_cell_kernel,
        grid=(nb, ngrid),
        in_specs=[resident(D), wspec(D, H4), wspec(1, H4), wspec(H, H4)],
        out_specs=out_final,
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bt, bb, H4), jnp.float32)],
        interpret=pr.interp(False),
    )(*a))
    t_mxu = timeit(lambda: mxu_cell_fn(x, iW.T, b.reshape(1, H4), sW.T),
                   "mxu+cell compute-only")

    # ---- chain-only: recurrent dot + cell, resident gx (no gate GEMM) -------
    def chain_kernel(gx_ref, swt_ref, out_ref, h_carry, c_carry):
        @pl.when(pl.program_id(1) == 0)
        def _():
            h_carry[:] = jnp.zeros_like(h_carry)
            c_carry[:] = jnp.zeros_like(c_carry)

        def body(j, _):
            k = order(j)
            pre = gx_ref[k].astype(jnp.float32) + jnp.dot(
                h_carry[:], swt_ref[:], preferred_element_type=jnp.float32)
            cell(pre, h_carry, c_carry)
            return 0

        pr.run_steps(body, bt, True)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = h_carry[:]

    chain_fn = jax.jit(lambda *a: pl.pallas_call(
        chain_kernel,
        grid=(nb, ngrid),
        in_specs=[resident(H4), wspec(H, H4)],
        out_specs=out_final,
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32)],
        interpret=pr.interp(False),
    )(*a))
    t_chain = timeit(lambda: chain_fn(gx, sW.T), "chain-only (critical)")

    # probe fidelity: the chain kernel fed the TRUE gates must reproduce
    # the shipped kernel's final h (bf16-rounding tolerance — the probe
    # input gx is rounded to bf16, the shipped scratch keeps it f32)
    gx_true = (x.astype(jnp.float32).reshape(T * B, D) @ iW.T
               + b).reshape(T, B, H4).astype(bf)
    h_full = np.asarray(full_fn(x), np.float32)[-1]
    h_probe = np.asarray(chain_fn(gx_true, sW.T), np.float32)
    relmax = np.abs(h_full - h_probe).max() / (np.abs(h_full).max() + 1e-9)
    print("  chain-probe parity vs shipped final h: relmax %.2e" % relmax)

    # ---- cell-only: the VPU work alone, no dots -----------------------------
    def cell_kernel(gx_ref, out_ref, h_carry, c_carry):
        @pl.when(pl.program_id(1) == 0)
        def _():
            h_carry[:] = jnp.zeros_like(h_carry)
            c_carry[:] = jnp.zeros_like(c_carry)

        def body(j, _):
            k = order(j)
            pre = gx_ref[k].astype(jnp.float32) + jnp.concatenate(
                [h_carry[:]] * 4, axis=1)
            cell(pre, h_carry, c_carry)
            return 0

        pr.run_steps(body, bt, True)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = h_carry[:]

    cell_fn = jax.jit(lambda *a: pl.pallas_call(
        cell_kernel,
        grid=(nb, ngrid),
        in_specs=[resident(H4)],
        out_specs=out_final,
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32)],
        interpret=pr.interp(False),
    )(*a))
    t_cell = timeit(lambda: cell_fn(gx), "cell-only (VPU)")

    # ---- stream-only: same blocks in/out, minimal math ----------------------
    def stream_kernel(x_ref, h_ref, c_ref, acts_ref, tc_ref, acc):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        xb = x_ref[:].astype(jnp.float32)
        acc[:] += xb
        h_ref[:] = x_ref[:]
        c_ref[:] = x_ref[:]
        acts_ref[:] = jnp.concatenate([x_ref[:]] * 4, axis=2)
        tc_ref[:] = x_ref[:]

    stream_fn = jax.jit(lambda *a: pl.pallas_call(
        stream_kernel,
        grid=(nb, ngrid),
        in_specs=[stream(D)],
        out_specs=[stream(H), stream(H), stream(H4), stream(H)],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), bf),
                   jax.ShapeDtypeStruct((T, B, H), bf),
                   jax.ShapeDtypeStruct((T, B, H4), bf),
                   jax.ShapeDtypeStruct((T, B, H), bf)],
        scratch_shapes=[pltpu.VMEM((bt, bb, D), jnp.float32)],
        interpret=pr.interp(False),
    )(*a))
    t_stream = timeit(lambda: stream_fn(x)[0], "stream-only (DMA)")

    # ---- analytic bounds ----------------------------------------------------
    # MXU: gate GEMM (T·B rows × [D,4H]) + T serialized chain dots
    # ([B,H]×[H,4H]); both 2·T·B·H4·{D,H} FLOP.
    t_mxu_an = 2 * T * B * H4 * (D + H) / MXU_BF16 * 1e3
    # streams: in x (D) bf16; out h,c,tc (H each) + acts (4H) bf16
    t_dma_an = T * B * 2 * (D + 7 * H) / HBM_BW * 1e3

    print()
    print("analytic  MXU %6.3f ms   DMA %6.3f ms" % (t_mxu_an, t_dma_an))
    sol = max(t_mxu, t_stream)
    print("achievable SoL = max(mxu+cell %.3f, stream %.3f) = %.3f ms"
          % (t_mxu, t_stream, sol))
    print("measured full kernel:  %.3f ms  ->  %.0f%% of achievable, "
          "%.0f%% of paper MXU" % (t_full, 100 * sol / t_full,
                                   100 * t_mxu_an / t_full))
    print("5-layer extrapolation: %.2f ms measured vs %.2f ms SoL"
          % (5 * t_full, 5 * sol))


if __name__ == "__main__":
    main()
