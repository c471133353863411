"""Pallas CRF lattice kernels (interpret mode) vs the lax.scan path."""

import jax.numpy as jnp
import numpy as np

from taiyaki_tpu import flipflopfings
from taiyaki_tpu.ops import flipflop as ffops
from taiyaki_tpu.ops import pallas_crf


def setup(T=24, B=4, L=12, seed=0):
    rng = np.random.default_rng(seed)
    lp = jnp.asarray(rng.normal(size=(T, B, 40)).astype(np.float32))
    seqs = np.zeros((B, L), dtype=np.int32)
    seqlens = rng.integers(2, L + 1, size=B).astype(np.int32)
    for b in range(B):
        seqs[b, :seqlens[b]] = flipflopfings.flipflop_code(
            rng.integers(0, 4, size=seqlens[b]))
    return lp, jnp.asarray(seqs), jnp.asarray(seqlens)


def lattice_streams(lp, seqs, seqlens):
    stay_idx, move_idx = ffops.make_seq_indices(seqs, 4)
    sel_stay, sel_move = ffops._make_selectors(stay_idx, move_idx, None,
                                               None, 40)
    stay_all, move_all = ffops._select_all_scores(lp, sel_stay, sel_move)
    npos = seqs.shape[1]
    pos = jnp.arange(npos)[None, :]
    valid = pos < seqlens[:, None]
    return stay_idx, move_idx, stay_all, move_all, valid


def test_crf_forward_kernel_matches_scan():
    lp, seqs, seqlens = setup()
    stay_idx, move_idx, stay_all, move_all, valid = lattice_streams(
        lp, seqs, seqlens)
    # scan reference
    score_ref, lattice_ref = ffops._forward_scores(
        lp, stay_idx, move_idx, None, None, seqlens, collect_lattice=True)
    # pallas (interpret)
    bt = 8
    stay_p, move_p, valid_p = ffops._pallas_lattice_inputs(
        stay_all, move_all, valid, bt, dtype=jnp.float32)
    fwd_final, score, lattice = pallas_crf.crf_forward(
        stay_p, move_p, valid_p, block_t=bt, interpret=True)
    npos = seqs.shape[1]
    last = jnp.clip(seqlens - 1, 0, npos - 1)
    score = score + jnp.take_along_axis(
        fwd_final[:, :npos], last[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(lattice[:lp.shape[0], :, :npos]),
        np.asarray(lattice_ref), rtol=1e-4, atol=1e-4)


def test_crf_backward_kernel_matches_scan_grad():
    lp, seqs, seqlens = setup(seed=3)
    stay_idx, move_idx, stay_all, move_all, valid = lattice_streams(
        lp, seqs, seqlens)
    T, B, _ = lp.shape
    npos = seqs.shape[1]
    # scan-path gradient (the ground truth)
    score_ref, grad_ref = ffops._grad_scores(
        lp, stay_idx, move_idx, None, None, seqlens)

    # pallas path assembled manually (interpret)
    bt = 8
    stay_p, move_p, valid_p = ffops._pallas_lattice_inputs(
        stay_all, move_all, valid, bt, dtype=jnp.float32)
    fwd_final, score, lattice = pallas_crf.crf_forward(
        stay_p, move_p, valid_p, block_t=bt, interpret=True)
    last = jnp.clip(seqlens - 1, 0, npos - 1)
    post_stay, post_move = pallas_crf.crf_backward_posteriors(
        stay_p, move_p, lattice, valid_p,
        last[:, None].astype(jnp.int32), block_t=bt, interpret=True)
    sel_stay, sel_move = ffops._make_selectors(stay_idx, move_idx, None,
                                               None, 40)
    grad = (jnp.einsum("tbl,bls->tbs", post_stay[:T, :, :npos], sel_stay)
            + jnp.einsum("tbl,bls->tbs", post_move[:T, :, :npos - 1],
                         sel_move))
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref),
                               rtol=1e-4, atol=1e-5)


def test_crf_bf16_residuals_close():
    # bf16 lattice/posterior storage (gradient-only residuals) must keep
    # score exact and posteriors close to the f32 kernels
    lp, seqs, seqlens = setup()
    _, _, stay_all, move_all, valid = lattice_streams(lp, seqs, seqlens)
    stay_p, move_p, valid_p = ffops._pallas_lattice_inputs(
        stay_all, move_all, valid, 8, dtype=jnp.float32)
    fwd32, score32, lat32 = pallas_crf.crf_forward(
        stay_p, move_p, valid_p, block_t=8, interpret=True)
    fwd16, score16, lat16 = pallas_crf.crf_forward(
        stay_p, move_p, valid_p, block_t=8, interpret=True,
        residual_dtype=jnp.bfloat16)
    # score and final lattice come from the f32 carry: exact
    np.testing.assert_array_equal(np.asarray(score16), np.asarray(score32))
    np.testing.assert_array_equal(np.asarray(fwd16), np.asarray(fwd32))
    last = jnp.clip(seqlens - 1, 0, seqs.shape[1] - 1)[:, None]
    ps32, pm32 = pallas_crf.crf_backward_posteriors(
        stay_p, move_p, lat32, valid_p, last.astype(jnp.int32),
        block_t=4, interpret=True)
    ps16, pm16 = pallas_crf.crf_backward_posteriors(
        stay_p, move_p, lat16, valid_p, last.astype(jnp.int32),
        block_t=4, interpret=True, out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(ps16, dtype=np.float32),
                               np.asarray(ps32), atol=0.02)
    np.testing.assert_allclose(np.asarray(pm16, dtype=np.float32),
                               np.asarray(pm32), atol=0.02)


def test_crf_bf16_score_streams_close():
    # bf16 stay/move input streams (the production default,
    # _score_stream_dtype) perturb scores only by input rounding:
    # kernel arithmetic stays f32.
    lp, seqs, seqlens = setup(seed=7)
    stay_idx, move_idx, stay_all, move_all, valid = lattice_streams(
        lp, seqs, seqlens)
    score_ref, _ = ffops._forward_scores(
        lp, stay_idx, move_idx, None, None, seqlens, collect_lattice=True)
    stay_p, move_p, valid_p = ffops._pallas_lattice_inputs(
        stay_all, move_all, valid, 8, dtype=jnp.bfloat16)
    fwd_final, score, lattice = pallas_crf.crf_forward(
        stay_p, move_p, valid_p, block_t=8, interpret=True)
    npos = seqs.shape[1]
    last = jnp.clip(seqlens - 1, 0, npos - 1)
    score = score + jnp.take_along_axis(
        fwd_final[:, :npos], last[:, None], axis=1)[:, 0]
    assert score.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=5e-3, atol=0.05 * lp.shape[0])

    # posterior gradient path stays close too
    post_stay, post_move = pallas_crf.crf_backward_posteriors(
        stay_p, move_p, lattice, valid_p, last[:, None].astype(jnp.int32),
        block_t=4, interpret=True)
    _, grad_ref = ffops._grad_scores(
        lp, stay_idx, move_idx, None, None, seqlens)
    sel_stay, sel_move = ffops._make_selectors(stay_idx, move_idx, None,
                                               None, 40)
    T = lp.shape[0]
    grad = (jnp.einsum("tbl,bls->tbs", post_stay[:T, :, :npos], sel_stay)
            + jnp.einsum("tbl,bls->tbs", post_move[:T, :, :npos - 1],
                         sel_move))
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref),
                               atol=0.03)


def _fused_inputs(lp, seqs, seqlens, bt):
    stay_idx, move_idx = ffops.make_seq_indices(seqs, 4)
    npos = seqs.shape[1]
    pos = jnp.arange(npos)[None, :]
    valid = pos < seqlens[:, None]
    setup = ffops._fused_setup(lp, stay_idx, move_idx, None, None, valid)
    assert setup is not None
    _, _, _, idxs, _, valid_p = setup
    lp_p = ffops._pad_axis(lp.astype(jnp.float32), 0, bt, 0.0)
    return stay_idx, move_idx, idxs, lp_p, valid_p


def test_crf_forward_fused_matches_scan():
    """In-kernel score selection (batched one-hot dot against
    scratch-built per-row selectors) must reproduce the einsum+stream
    forward.  The fused kernel's score/selector scratch is bf16 (the
    same storage the unfused path's score streams use), so the tight
    comparison is against the unfused kernel fed bf16 streams; the
    exact-f32 scan is a loose sanity anchor."""
    lp, seqs, seqlens = setup(T=23, B=8, L=12, seed=5)
    bt = 4
    stay_idx, move_idx, idxs, lp_p, valid_p = _fused_inputs(
        lp, seqs, seqlens, bt)
    npos = seqs.shape[1]
    last = jnp.clip(seqlens - 1, 0, npos - 1)

    fwd_final, score, lattice = pallas_crf.crf_forward_fused(
        lp_p, *idxs, valid_p, block_b=8, block_t=bt,
        true_len=lp.shape[0], interpret=True)
    score = score + jnp.take_along_axis(
        fwd_final[:, :npos], last[:, None], axis=1)[:, 0]

    # tight: unfused Pallas forward on explicitly-bf16 score streams
    _, _, stay_all, move_all, valid = lattice_streams(lp, seqs, seqlens)
    stay_p, move_p, valid_p2 = ffops._pallas_lattice_inputs(
        stay_all, move_all, valid, bt, dtype=jnp.bfloat16)
    fwd_u, score_u, lattice_u = pallas_crf.crf_forward(
        stay_p, move_p, valid_p2, block_t=bt,
        residual_dtype=jnp.bfloat16, interpret=True)
    score_u = score_u + jnp.take_along_axis(
        fwd_u[:, :npos], last[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lattice[:lp.shape[0], :, :npos]).astype(np.float32),
        np.asarray(lattice_u[:lp.shape[0], :, :npos]).astype(np.float32),
        rtol=1e-6, atol=1e-6)

    # loose: exact-f32 scan (bf16 score rounding is the documented gap)
    score_ref, _ = ffops._forward_scores(
        lp, stay_idx, move_idx, None, None, seqlens, collect_lattice=True)
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=5e-3, atol=5e-2)

    # emit_lattice=False (primal/validation) returns the same score
    fwd2, score2, none = pallas_crf.crf_forward_fused(
        lp_p, *idxs, valid_p, block_b=8, block_t=bt,
        emit_lattice=False, true_len=lp.shape[0], interpret=True)
    assert none is None
    score2 = score2 + jnp.take_along_axis(
        fwd2[:, :npos], last[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(np.asarray(score2), np.asarray(score),
                               rtol=1e-6)


def test_crf_backward_fused_matches_scan_grad():
    """The fully-fused backward (selection in, posterior scatter out)
    must reproduce the unfused bf16 chain's d(score)/d(lp) — multi-
    batch-tile, time padding active."""
    lp, seqs, seqlens = setup(T=23, B=16, L=12, seed=6)
    bt = 4
    stay_idx, move_idx, idxs, lp_p, valid_p = _fused_inputs(
        lp, seqs, seqlens, bt)
    npos = seqs.shape[1]
    last = jnp.clip(seqlens - 1, 0, npos - 1)
    _, _, lattice = pallas_crf.crf_forward_fused(
        lp_p, *idxs, valid_p, block_b=8, block_t=bt,
        true_len=lp.shape[0], interpret=True)
    grad = pallas_crf.crf_backward_fused(
        lp_p, *idxs, lattice, valid_p, last[:, None].astype(jnp.int32),
        block_b=8, block_t=bt, true_len=lp.shape[0], interpret=True)

    # tight: unfused bf16 pallas chain (streams + posts bf16) + einsums
    _, _, stay_all, move_all, valid = lattice_streams(lp, seqs, seqlens)
    stay_p, move_p, valid_p2 = ffops._pallas_lattice_inputs(
        stay_all, move_all, valid, bt, dtype=jnp.bfloat16)
    _, _, lattice_u = pallas_crf.crf_forward(
        stay_p, move_p, valid_p2, block_t=bt,
        residual_dtype=jnp.bfloat16, interpret=True)
    post_stay, post_move = pallas_crf.crf_backward_posteriors(
        stay_p, move_p, lattice_u, valid_p2,
        last[:, None].astype(jnp.int32), block_t=bt,
        out_dtype=jnp.bfloat16, interpret=True)
    T = lp.shape[0]
    sel_stay, sel_move = ffops._make_selectors(stay_idx, move_idx, None,
                                               None, 40)
    grad_u = (jnp.einsum("tbl,bls->tbs",
                         post_stay[:T, :, :npos].astype(jnp.float32),
                         sel_stay)
              + jnp.einsum("tbl,bls->tbs",
                           post_move[:T, :, :npos - 1].astype(jnp.float32),
                           sel_move))
    np.testing.assert_allclose(np.asarray(grad[:T]), np.asarray(grad_u),
                               rtol=1e-5, atol=1e-5)

    # loose: exact-f32 scan grad
    _, grad_ref = ffops._grad_scores(lp, stay_idx, move_idx, None, None,
                                     seqlens)
    np.testing.assert_allclose(np.asarray(grad[:T]), np.asarray(grad_ref),
                               rtol=2e-2, atol=5e-3)


def test_crf_fused_cat_mod_selectors():
    """cat_mod folds weighted mod columns into the move selector; the
    fused path must reproduce the unfused grad with those non-one-hot
    selectors too (mod weights round to bf16 in the selector scratch —
    the same error class as the bf16 score streams)."""
    rng = np.random.default_rng(9)
    T, B, L, nmods = 16, 8, 10, 2
    nstate = 40 + 1 + nmods
    lp = jnp.asarray(rng.normal(size=(T, B, nstate)).astype(np.float32))
    seqs = np.zeros((B, L), dtype=np.int32)
    seqlens = rng.integers(2, L + 1, size=B).astype(np.int32)
    for b in range(B):
        seqs[b, :seqlens[b]] = flipflopfings.flipflop_code(
            rng.integers(0, 4, size=seqlens[b]))
    seqs = jnp.asarray(seqs)
    seqlens = jnp.asarray(seqlens)
    stay_idx, move_idx = ffops.make_seq_indices(seqs, 4)
    modmove_idx = jnp.asarray(
        rng.integers(40, nstate, size=(B, L - 1)).astype(np.int32))
    modmove_fact = jnp.asarray(
        rng.uniform(0.1, 1.0, size=(B, L - 1)).astype(np.float32))
    score_ref, grad_ref = ffops._grad_scores(
        lp, stay_idx, move_idx, modmove_idx, modmove_fact, seqlens)
    pos = jnp.arange(L)[None, :]
    valid = pos < seqlens[:, None]
    bt = 4
    setup_out = ffops._fused_setup(lp, stay_idx, move_idx, modmove_idx,
                                   modmove_fact, valid)
    assert setup_out is not None
    _, _, _, idxs, _, valid_p = setup_out
    lp_p = ffops._pad_axis(lp.astype(jnp.float32), 0, bt, 0.0)
    fwd_final, score, lattice = pallas_crf.crf_forward_fused(
        lp_p, *idxs, valid_p, block_b=8, block_t=bt, true_len=T,
        interpret=True)
    last = jnp.clip(seqlens - 1, 0, L - 1)
    score = score + jnp.take_along_axis(
        fwd_final[:, :L], last[:, None], axis=1)[:, 0]
    grad = pallas_crf.crf_backward_fused(
        lp_p, *idxs, lattice, valid_p, last[:, None].astype(jnp.int32),
        block_b=8, block_t=bt, true_len=T, interpret=True)
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref),
                               rtol=5e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(grad[:T]), np.asarray(grad_ref),
                               rtol=2e-2, atol=5e-3)


def test_fused_tile_budgets():
    """Tile picker honors the measured scoped-VMEM limits: the canonical
    production shape (S=40, L=512) keeps the bb=64 tile, while the wider
    cat_mod lattice (S=45) must drop to bb=32 — bb=64 at S=45 blew the
    16MB scoped-vmem limit by 0.5M on v5e (ops/pallas_crf.py:fused_tile)."""
    assert pallas_crf.fused_tile(256, 40, 512) == (64, 8)
    assert pallas_crf.fused_tile(256, 45, 512) == (32, 16)
    # RNA production width: both fit at smaller tiles, neither bails;
    # the r5 budget (3.5M stream blocks) buys bt=16 at the RNA tile
    # (measured -7% fwd / -11% bwd, misc/crf_roofline.py)
    assert pallas_crf.fused_tile(256, 40, 1536) == (16, 16)
    assert pallas_crf.fused_tile(256, 45, 1536) is not None
    # batch not divisible by 8 -> no tile (caller falls back unfused)
    assert pallas_crf.fused_tile(12, 40, 512) is None
