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

    # ---- compute-only chain: same per-step math, NO streaming ---------------
    # every input block index-maps to block 0, so after the first grid
    # step all operands are VMEM-resident and the measurement is the
    # pure sequential compute: cell VPU chain + chain dot, x ngrid*bt
    # steps.  Distinguishes "the chain itself is slow" from "the chain
    # is waiting on HBM".
    resident = lambda w: pl.BlockSpec((bt, bb, w), lambda ib, it: (0, 0, 0),
                                      memory_space=pltpu.VMEM)

    chain_res_fn = jax.jit(lambda *a: pl.pallas_call(
        chain_kernel,
        grid=(nb, ngrid),
        in_specs=[resident(H), resident(H4), resident(H), resident(H),
                  pl.BlockSpec((H4, H), pr._WMAP, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, H), lambda ib, it: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32)],
    )(*a))
    t_chain_res = timeit(lambda: chain_res_fn(dh, acts, tc, c_prev, sW),
                         "chain compute-only")

    # ---- 2-way interleaved chain: latency hiding via independent rows --------
    # the chain dependence is per-batch-row; splitting the tile into two
    # independent halves and alternating their cell/dot work lets one
    # half's VPU cell hide the other half's chain-dot latency.
    def chain2_kernel(dh_ref, acts_ref, tc_ref, cprev_ref, sw_ref, out_ref,
                      dh_carry, dc_carry):
        hb = bb // 2

        @pl.when(pl.program_id(1) == 0)
        def _():
            dh_carry[:] = jnp.zeros_like(dh_carry)
            dc_carry[:] = jnp.zeros_like(dc_carry)

        def half_cell(k, lo, hi):
            acts_h = acts_ref[k, lo:hi].astype(jnp.float32)
            i = acts_h[:, :H]
            f = acts_h[:, H:2 * H]
            g = acts_h[:, 2 * H:3 * H]
            o = acts_h[:, 3 * H:]
            tch = tc_ref[k, lo:hi].astype(jnp.float32)
            dhh = dh_ref[k, lo:hi] + dh_carry[lo:hi]
            do = dhh * tch
            dc = dhh * o * (1.0 - tch * tch) + dc_carry[lo:hi]
            di = dc * g
            df = dc * cprev_ref[k, lo:hi].astype(jnp.float32)
            dg = dc * i
            dpre = jnp.concatenate(
                [di * i * (1.0 - i), df * f * (1.0 - f),
                 dg * (1.0 - g * g), do * o * (1.0 - o)], axis=1)
            return dpre, dc * f

        def body(j, _):
            k = order(j)
            dpreA, dcA = half_cell(k, 0, hb)
            dh_carry[0:hb] = jnp.dot(dpreA, sw_ref[:],
                                     preferred_element_type=jnp.float32)
            dc_carry[0:hb] = dcA
            dpreB, dcB = half_cell(k, hb, bb)
            dh_carry[hb:bb] = jnp.dot(dpreB, sw_ref[:],
                                      preferred_element_type=jnp.float32)
            dc_carry[hb:bb] = dcB
            return 0

        pr.run_steps(body, bt, True)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = dh_carry[:]

    chain2_fn = jax.jit(lambda *a: pl.pallas_call(
        chain2_kernel,
        grid=(nb, ngrid),
        in_specs=[resident(H), resident(H4), resident(H), resident(H),
                  pl.BlockSpec((H4, H), pr._WMAP, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, H), lambda ib, it: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32)],
    )(*a))
    t_chain2 = timeit(lambda: chain2_fn(dh, acts, tc, c_prev, sW),
                      "chain 2-way interleave")

    # ---- factor-cell probe: forward stores premultiplied grad factors --------
    # P1=g*i*(1-i), P2=cprev*f*(1-f), P3=i*(1-g^2), P4=tc*o*(1-o),
    # P5=o*(1-tc^2), P6=f  (one packed [T,B,6H] bf16 stream; 6H bytes ==
    # the acts(4H)+tc+cprev streams it replaces).  Backward cell becomes
    # ~8 vector ops: dc = dh*P5 + dcc; dpre = [dc*P1, dc*P2, dc*P3,
    # dh*P4]; dc' = dc*P6.
    af = acts.astype(jnp.float32)
    i_, f_, g_, o_ = (af[:, :, :H], af[:, :, H:2 * H],
                      af[:, :, 2 * H:3 * H], af[:, :, 3 * H:])
    tcf = tc.astype(jnp.float32)
    cpf = c_prev.astype(jnp.float32)
    factors = jnp.concatenate(
        [g_ * i_ * (1 - i_), cpf * f_ * (1 - f_), i_ * (1 - g_ * g_),
         tcf * o_ * (1 - o_), o_ * (1 - tcf * tcf), f_],
        axis=2).astype(bf)
    H6 = 6 * H

    def fcell(dh_ref, fac_ref, dh_carry, dc_carry, k):
        fac = fac_ref[k].astype(jnp.float32)
        dh_k = dh_ref[k] + dh_carry[:]
        dc = dh_k * fac[:, 4 * H:5 * H] + dc_carry[:]
        dpre = jnp.concatenate(
            [dc * fac[:, :H], dc * fac[:, H:2 * H],
             dc * fac[:, 2 * H:3 * H], dh_k * fac[:, 3 * H:4 * H]],
            axis=1)
        return dpre, dc * fac[:, 5 * H:]

    def fchain_kernel(dh_ref, fac_ref, sw_ref, out_ref,
                      dh_carry, dc_carry):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dh_carry[:] = jnp.zeros_like(dh_carry)
            dc_carry[:] = jnp.zeros_like(dc_carry)

        def body(j, _):
            k = order(j)
            dpre, dc_next = fcell(dh_ref, fac_ref, dh_carry, dc_carry, k)
            dh_carry[:] = jnp.dot(dpre, sw_ref[:],
                                  preferred_element_type=jnp.float32)
            dc_carry[:] = dc_next
            return 0

        pr.run_steps(body, bt, True)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = dh_carry[:]

    for label, spec in (("factor chain compute", resident),
                        ("factor chain +stream", stream)):
        fchain_fn = jax.jit(lambda *a, s=spec: pl.pallas_call(
            fchain_kernel,
            grid=(nb, ngrid),
            in_specs=[s(H), s(H6),
                      pl.BlockSpec((H4, H), pr._WMAP,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bb, H), lambda ib, it: (ib, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                            pltpu.VMEM((bb, H), jnp.float32)],
        )(*a))
        timeit(lambda: fchain_fn(dh, factors, sW), label)

    # ---- full factor-backward kernel (dx + weight grads, streamed) ----------
    def fbwd_kernel(dh_ref, fac_ref, h_ref, x_ref, sw_ref, iwt_ref,
                    dx_ref, dsw_ref, diw_ref, db_ref,
                    dh_carry, dc_carry, g_hold):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dh_carry[:] = jnp.zeros_like(dh_carry)
            dc_carry[:] = jnp.zeros_like(dc_carry)
            g_hold[:] = jnp.zeros_like(g_hold)
            dsw_ref[:] = jnp.zeros_like(dsw_ref)
            diw_ref[:] = jnp.zeros_like(diw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        base = pr._block_base(ngrid, bt, True)

        def body(j, _):
            k = order(j)
            dpre, dc_next = fcell(dh_ref, fac_ref, dh_carry, dc_carry, k)
            dpre = jnp.where(base + k < T, dpre, 0.0)
            dx = jnp.dot(dpre, iwt_ref[:],
                         preferred_element_type=jnp.float32)
            dx_ref[k] = dx.astype(dx_ref.dtype)
            dsw_ref[0] += jax.lax.dot_general(
                g_hold[:], h_ref[k].astype(jnp.float32),
                pr._BATCH_CONTRACT, preferred_element_type=jnp.float32)
            diw_ref[0] += jax.lax.dot_general(
                dpre, x_ref[k].astype(jnp.float32), pr._BATCH_CONTRACT,
                preferred_element_type=jnp.float32)
            db_ref[0] += jnp.sum(dpre, axis=0, keepdims=True)
            g_hold[:] = dpre
            dh_carry[:] = jnp.dot(dpre, sw_ref[:],
                                  preferred_element_type=jnp.float32)
            dc_carry[:] = dc_next
            return 0

        pr.run_steps(body, bt, True)

    wmap3b = lambda ib, it: (ib, 0, 0)
    fbwd_fn = jax.jit(lambda *a: pl.pallas_call(
        fbwd_kernel,
        grid=(nb, ngrid),
        in_specs=[stream(H), stream(H6), stream(H), stream(D),
                  pl.BlockSpec((H4, H), pr._WMAP, memory_space=pltpu.VMEM),
                  pl.BlockSpec((H4, D), pr._WMAP, memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bt, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, H), wmap3b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, D), wmap3b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H4), wmap3b, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), bf),
            jax.ShapeDtypeStruct((nb, H4, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H4, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, H4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H4), jnp.float32)],
    )(*a))
    t_fbwd = timeit(lambda: fbwd_fn(dh, factors, h, x, sW, iW)[1],
                    "FULL factor backward")
    ref_out = full_fn(dh, acts, tc, c_prev, h, x, sW, iW)
    new_out = fbwd_fn(dh, factors, h, x, sW, iW)
    for a, b, name in zip(ref_out, new_out, ["dx", "dsw", "diw", "db"]):
        aa = np.asarray(a, np.float32)
        bb_ = np.asarray(b, np.float32).reshape(aa.shape)
        scale = np.abs(aa).max() + 1e-9
        print("  factor parity %-4s relmax %.2e"
              % (name, np.abs(aa - bb_).max() / scale))

    # ---- pure-MXU probe: the 4 dots per row, no cell, resident blocks --------
    def mxu_kernel(acts_ref, h_ref, x_ref, sw_ref, iwt_ref, out_ref,
                   dh_carry, g_hold):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dh_carry[:] = jnp.zeros_like(dh_carry)
            g_hold[:] = jnp.zeros_like(g_hold)

        def body(j, _):
            k = order(j)
            dpre = acts_ref[k].astype(jnp.float32)
            dx = jnp.dot(dpre, iwt_ref[:],
                         preferred_element_type=jnp.float32)
            s = jax.lax.dot_general(
                g_hold[:], h_ref[k].astype(jnp.float32),
                pr._BATCH_CONTRACT, preferred_element_type=jnp.float32)
            w = jax.lax.dot_general(
                dpre, x_ref[k].astype(jnp.float32), pr._BATCH_CONTRACT,
                preferred_element_type=jnp.float32)
            g_hold[:] = dpre + s[:1, :bb].T * 0 + w[:1, :bb].T * 0
            dh_carry[:] = jnp.dot(dpre, sw_ref[:],
                                  preferred_element_type=jnp.float32) \
                + dx[:, :H] * 0
            return 0

        pr.run_steps(body, bt, True)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = dh_carry[:]

    mxu_fn = jax.jit(lambda *a: pl.pallas_call(
        mxu_kernel,
        grid=(nb, ngrid),
        in_specs=[resident(H4), resident(H), resident(D),
                  pl.BlockSpec((H4, H), pr._WMAP, memory_space=pltpu.VMEM),
                  pl.BlockSpec((H4, D), pr._WMAP,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, H), lambda ib, it: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H4), jnp.float32)],
    )(*a))
    timeit(lambda: mxu_fn(acts, h, x, sW, iW), "pure-MXU 4 dots/row")

    # ---- merged dx+chain dot: one [4H, D+H] weight, fewer MXU bubbles --------
    iw_sw = jnp.concatenate([iW, sW], axis=1)          # [4H, D+H]

    def merged_kernel(dh_ref, acts_ref, tc_ref, cprev_ref, h_ref,
                      x_ref, w2_ref,
                      dx_ref, dsw_ref, diw_ref, db_ref,
                      dh_carry, dc_carry, g_hold):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dh_carry[:] = jnp.zeros_like(dh_carry)
            dc_carry[:] = jnp.zeros_like(dc_carry)
            g_hold[:] = jnp.zeros_like(g_hold)
            dsw_ref[:] = jnp.zeros_like(dsw_ref)
            diw_ref[:] = jnp.zeros_like(diw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        base = pr._block_base(ngrid, bt, True)

        def body(j, _):
            k = order(j)
            dpre, dc_next = pr._lstm_cell_bwd_acts(
                dh_ref, acts_ref, tc_ref, cprev_ref, dh_carry, dc_carry,
                k, H)
            dpre = jnp.where(base + k < T, dpre, 0.0)
            both = jnp.dot(dpre, w2_ref[:],
                           preferred_element_type=jnp.float32)
            dx_ref[k] = both[:, :D].astype(dx_ref.dtype)
            dsw_ref[0] += jax.lax.dot_general(
                g_hold[:], h_ref[k].astype(jnp.float32),
                pr._BATCH_CONTRACT, preferred_element_type=jnp.float32)
            diw_ref[0] += jax.lax.dot_general(
                dpre, x_ref[k].astype(jnp.float32), pr._BATCH_CONTRACT,
                preferred_element_type=jnp.float32)
            db_ref[0] += jnp.sum(dpre, axis=0, keepdims=True)
            g_hold[:] = dpre
            dh_carry[:] = both[:, D:]
            dc_carry[:] = dc_next
            return 0

        pr.run_steps(body, bt, True)

    merged_fn = jax.jit(lambda *a: pl.pallas_call(
        merged_kernel,
        grid=(nb, ngrid),
        in_specs=[stream(H), stream(H4), stream(H), stream(H), stream(H),
                  stream(D),
                  pl.BlockSpec((H4, D + H), pr._WMAP,
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bt, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, H), wmap3b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, D), wmap3b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H4), wmap3b, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), bf),
            jax.ShapeDtypeStruct((nb, H4, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H4, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, H4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H4), jnp.float32)],
    )(*a))
    t_merged = timeit(
        lambda: merged_fn(dh, acts, tc, c_prev, h, x, iw_sw)[1],
        "merged dx+chain dot")
    new_out = merged_fn(dh, acts, tc, c_prev, h, x, iw_sw)
    for a, b, name in zip(ref_out, new_out, ["dx", "dsw", "diw", "db"]):
        aa = np.asarray(a, np.float32)
        bb_ = np.asarray(b, np.float32).reshape(aa.shape)
        print("  merged parity %-4s maxabs %g"
              % (name, np.abs(aa - bb_).max()))

    # ---- reordered-body experiment -------------------------------------------
    # the shipped body issues the chain dot LAST of its four dots; with
    # in-order issue its completion (which the next cell's VPU work
    # blocks on) drains behind dx/dsw/diw.  This variant issues the
    # chain dot FIRST so the next cell overlaps the non-critical dots.
    def reordered_kernel(dh_ref, acts_ref, tc_ref, cprev_ref, h_ref,
                         x_ref, sw_ref, iwt_ref,
                         dx_ref, dsw_ref, diw_ref, db_ref,
                         dh_carry, dc_carry, g_hold):
        @pl.when(pl.program_id(1) == 0)
        def _():
            dh_carry[:] = jnp.zeros_like(dh_carry)
            dc_carry[:] = jnp.zeros_like(dc_carry)
            g_hold[:] = jnp.zeros_like(g_hold)
            dsw_ref[:] = jnp.zeros_like(dsw_ref)
            diw_ref[:] = jnp.zeros_like(diw_ref)
            db_ref[:] = jnp.zeros_like(db_ref)

        base = pr._block_base(ngrid, bt, True)

        def body(j, _):
            k = order(j)
            dpre, dc_next = pr._lstm_cell_bwd_acts(
                dh_ref, acts_ref, tc_ref, cprev_ref, dh_carry, dc_carry,
                k, H)
            dpre = jnp.where(base + k < T, dpre, 0.0)
            # critical-path dot FIRST
            dh_carry[:] = jnp.dot(dpre, sw_ref[:],
                                  preferred_element_type=jnp.float32)
            dc_carry[:] = dc_next
            dx = jnp.dot(dpre, iwt_ref[:],
                         preferred_element_type=jnp.float32)
            dx_ref[k] = dx.astype(dx_ref.dtype)
            dsw_ref[0] += jax.lax.dot_general(
                g_hold[:], h_ref[k].astype(jnp.float32),
                pr._BATCH_CONTRACT, preferred_element_type=jnp.float32)
            diw_ref[0] += jax.lax.dot_general(
                dpre, x_ref[k].astype(jnp.float32), pr._BATCH_CONTRACT,
                preferred_element_type=jnp.float32)
            db_ref[0] += jnp.sum(dpre, axis=0, keepdims=True)
            g_hold[:] = dpre
            return 0

        pr.run_steps(body, bt, True)

    wmap3 = lambda ib, it: (ib, 0, 0)
    reord_fn = jax.jit(lambda *a: pl.pallas_call(
        reordered_kernel,
        grid=(nb, ngrid),
        in_specs=[stream(H), stream(H4), stream(H), stream(H), stream(H),
                  stream(D),
                  pl.BlockSpec((H4, H), pr._WMAP, memory_space=pltpu.VMEM),
                  pl.BlockSpec((H4, D), pr._WMAP, memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bt, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, H), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, D), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H4), wmap3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), bf),
            jax.ShapeDtypeStruct((nb, H4, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H4, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, H4), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H), jnp.float32),
                        pltpu.VMEM((bb, H4), jnp.float32)],
    )(*a))
    t_reord = timeit(
        lambda: reord_fn(dh, acts, tc, c_prev, h, x, sW, iW)[1],
        "reordered (chain 1st)")

    # numerics: reorder must be bit-identical to the shipped kernel
    ref_out = full_fn(dh, acts, tc, c_prev, h, x, sW, iW)
    new_out = reord_fn(dh, acts, tc, c_prev, h, x, sW, iW)
    for a, b, name in zip(ref_out, new_out, ["dx", "dsw", "diw", "db"]):
        diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b.reshape(a.shape).astype(
                                         jnp.float32))))
        print("  reorder parity %-4s maxabs %g" % (name, diff))

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
