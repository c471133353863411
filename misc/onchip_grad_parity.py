#!/usr/bin/env python3
"""On-chip gradient parity: Pallas layer backward variants vs the XLA
scan VJP, on the real TPU (the CI tests cover interpret mode only; this
script is the on-chip evidence the kernels compute the same gradients
through the actual Mosaic lowering).

For each cell (lstm, gru), direction, and batch size (incl. a
multi-batch-tile size), compares d_x/d_iW/d_b/d_sW between:
  * the scan path (TAIYAKI_TPU_NO_PALLAS=1),
  * the stored-residual Pallas backward (TAIYAKI_TPU_NO_RECOMPUTE=1),
  * the recompute Pallas backward (TAIYAKI_TPU_RECOMPUTE=1),
all with f32 streams (TAIYAKI_TPU_F32_GRADS/GATES + BF16_ACTS=0) so the
comparison isolates kernel correctness from the documented bf16 stream
rounding.  Tolerance: single-bf16-MXU-pass matmul rounding (~1e-2
relative on accumulated weight grads).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# f32 streams; per-variant recompute flags set per trace below
os.environ["TAIYAKI_TPU_F32_GRADS"] = "1"
os.environ["TAIYAKI_TPU_BF16_ACTS"] = "0"

import jax
import jax.numpy as jnp

from taiyaki_tpu.ops import rnn


def grads(layer, x, iW, b, sW, dh, reverse):
    def f(x, iW, b, sW):
        return layer(x, iW, b, sW, reverse=reverse)
    _, vjp = jax.vjp(f, x, iW, b, sW)
    return vjp(dh)


def run(cell, B, T=96, H=128, D=64):
    layer = rnn.lstm_layer if cell == "lstm" else rnn.gru_layer
    k = 4 if cell == "lstm" else 3
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
    iW = jnp.asarray(rng.normal(size=(k * H, D)).astype(np.float32) * .3)
    b = jnp.asarray(rng.normal(size=(k * H,)).astype(np.float32) * .3)
    sW = jnp.asarray(rng.normal(size=(k * H, H)).astype(np.float32) * .3)
    dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    for reverse in (False, True):
        out = {}
        for variant, env in [
                ("scan", {"TAIYAKI_TPU_NO_PALLAS": "1"}),
                ("acts", {"TAIYAKI_TPU_NO_RECOMPUTE": "1",
                          "TAIYAKI_TPU_ACTS_BWD": "1"}),
                ("stored", {"TAIYAKI_TPU_NO_RECOMPUTE": "1",
                            "TAIYAKI_TPU_ACTS_BWD": "0"}),
                ("recompute", {"TAIYAKI_TPU_RECOMPUTE": "1"})]:
            saved = {kk: os.environ.get(kk) for kk in env}
            os.environ.update(env)
            try:
                out[variant] = [np.asarray(g) for g in jax.jit(
                    lambda *a: grads(layer, *a, reverse=reverse))(
                        x, iW, b, sW, dh)]
            finally:
                for kk, vv in saved.items():
                    if vv is None:
                        os.environ.pop(kk, None)
                    else:
                        os.environ[kk] = vv
        names = ["d_x", "d_iW", "d_b", "d_sW"]
        for variant in ("acts", "stored", "recompute"):
            # the stored GRU path's gx/gh residuals are bf16 by design
            # (ops/rnn.py hardcodes residual_dtype), and the rounding
            # compounds through the recurrent chain (measured 5.2e-2 at
            # rev=1; 7e-3 when the same kernel is fed f32 streams, so
            # this is stream rounding, not a lowering bug).  Recompute
            # rebuilds the gates in f32 and gets the tighter bound.
            # (for the GRU, ACTS_BWD is a no-op: "acts" hits the same
            # stored path and needs the same loose bound)
            tol = (8e-2 if (cell == "gru"
                            and variant in ("stored", "acts")) else 2e-2)
            for name, got, want in zip(names, out[variant], out["scan"]):
                scale = np.abs(want).max() + 1e-6
                err = np.abs(np.asarray(got).reshape(want.shape)
                             - want).max() / scale
                status = "ok" if err < tol else "FAIL"
                print(f"{cell} B={B} rev={int(reverse)} {variant:9s} "
                      f"{name:4s} relmax={err:.2e} {status}")
                if err >= tol:
                    sys.exit(1)


def run_crf(cat_mod, T=256, B=64, nbase=4, L=256, seqlen=160,
            sharpfact=1.3):
    """CRF loss cost+gradient parity on-chip: fused selection/scatter
    kernels (default) vs the unfused Pallas path
    (TAIYAKI_TPU_NO_SCORE_FUSE=1) vs the XLA scan
    (TAIYAKI_TPU_NO_PALLAS=1) — for the canonical AND the cat_mod
    (5mC) loss.  This pins the documented fused-cat_mod numerics class
    (mod column folded into the in-kernel one-hot dot) with a
    reproducible run instead of a prose claim."""
    from taiyaki_tpu.ops import flipflop as ff
    from taiyaki_tpu.flipflopfings import flipflop_code

    rng = np.random.default_rng(11)
    n_can = 2 * nbase * (nbase + 1)
    if cat_mod:
        # one mod (Z=5mC on C): can_mods_offsets [0,1,3,4,5], widths
        # mirror models/mLstm_cat_mod_flipflop at nbase=4
        can_mods_offsets = np.array([0, 1, 3, 4, 5], np.int32)
        mod_cat_weights = np.ones(5, np.float32)
        S = n_can + int(can_mods_offsets[-1])   # 40 + (ncan + nmod) = 45
    else:
        S = n_can                               # 40
    lp = jnp.asarray(rng.normal(size=(T, B, S)).astype(np.float32) * 0.3)
    seqs = np.zeros((B, L), np.int32)
    mod_cats = np.zeros((B, L), np.int32)
    seqlens = np.full(B, seqlen, np.int32)
    for i in range(B):
        labels = rng.integers(0, 5 if cat_mod else 4, size=seqlen)
        if cat_mod:
            # label 4 == Z (5mC, canonical C=1, mod category 1)
            mod_cats[i, :seqlen] = np.where(labels == 4, 1, 0)
            labels = np.where(labels == 4, 1, labels)
        seqs[i, :seqlen] = flipflop_code(labels)
    seqs, mod_cats = jnp.asarray(seqs), jnp.asarray(mod_cats)
    seqlens = jnp.asarray(seqlens)

    def loss_mean(lp):
        if cat_mod:
            v = ff.cat_mod_flipflop_loss(lp, seqs, seqlens, mod_cats,
                                         can_mods_offsets,
                                         mod_cat_weights, sharpfact)
        else:
            v = ff.crf_flipflop_loss(lp, seqs, seqlens, sharpfact)
        return v.mean()

    out = {}
    for variant, env in [
            ("scan", {"TAIYAKI_TPU_NO_PALLAS": "1"}),
            ("unfused", {"TAIYAKI_TPU_NO_SCORE_FUSE": "1"}),
            ("fused", {})]:
        saved = {kk: os.environ.get(kk) for kk in env}
        os.environ.update(env)
        try:
            cost, grad = jax.jit(jax.value_and_grad(loss_mean))(lp)
            out[variant] = (float(cost), np.asarray(grad))
        finally:
            for kk, vv in saved.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv
    name = "cat_mod" if cat_mod else "canonical"
    ok = True
    for variant in ("unfused", "fused"):
        dcost = abs(out[variant][0] - out["scan"][0]) / abs(out["scan"][0])
        scale = np.abs(out["scan"][1]).max() + 1e-9
        dgrad = np.abs(out[variant][1] - out["scan"][1]).max() / scale
        # bf16 score/posterior streams in both Pallas paths; the fused
        # cat_mod selector dot adds its own bf16 rounding of the
        # weighted mod column (documented ~3e-2 relmax class)
        tol = 5e-2 if cat_mod else 2e-2
        status = "ok" if (dcost < 1e-3 and dgrad < tol) else "FAIL"
        print(f"crf {name:9s} {variant:8s} dcost={dcost:.2e} "
              f"grad relmax={dgrad:.2e} {status}")
        ok &= status == "ok"
    # fused-vs-unfused perturbation, the number docs/performance.md cites
    scale = np.abs(out["unfused"][1]).max() + 1e-9
    dfu = np.abs(out["fused"][1] - out["unfused"][1]).max() / scale
    print(f"crf {name:9s} fused-vs-unfused grad relmax={dfu:.2e}")
    if not ok:
        sys.exit(1)


for cell in ("lstm", "gru"):
    for B in (256, 512):
        run(cell, B)
for cat_mod in (False, True):
    run_crf(cat_mod)
print("ALL OK")
