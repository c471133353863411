"""Flip-flop CRF loss and partition function — the core training numerics.

TPU-native re-design of the reference's C/AVX forward-backward kernels
(taiyaki/ctc/c_crf_flipflop.c, c_cat_mod_flipflop.c) and the torch/cupy
partition function (taiyaki/layers.py:1253-1299, cupy_extensions/flipflop.py).

Key design differences from the reference (same numerics, different layout):

* The reference concatenates ragged sequences and walks per-read index
  arrays on the CPU with OpenMP.  Here sequences are **padded** to a common
  (bucketed) length and the whole batch advances through the lattice in a
  single `lax.scan` over time — everything stays on device, eliminating the
  reference's GPU->CPU->GPU round-trip per step
  (bin/train_flipflop.py:162-173).
* The gradient is defined via `jax.custom_vjp`: the backward pass re-runs
  the forward recursion (recompute, not store — the tradeoff the reference
  notes in a TODO in c_crf_flipflop.c) and walks a reverse scan emitting the
  per-block posterior softmax over stay/move lattice transitions, exactly
  the algorithm of crf_flipflop_grad_step (c_crf_flipflop.c:372-432).

Numerics invariants preserved (SURVEY.md appendix):
* per-block max-renormalization of the lattice (c_crf_flipflop.c:73-77);
* paths start in the first sequence position; final score takes the last
  position only (c_crf_flipflop.c:112-132);
* cost = -score / nblk; sharpening multiplies scores pre-DP and divides
  the cost post-DP (ctc.pyx:119,145); for cat_mod models only the canonical
  transition columns are sharpened (ctc.pyx:265-269);
* the returned gradient is the gradient evaluated at the *sharpened* scores
  without post-division, matching FlipFlopCRF.backward (ctc.pyx:147-153).
"""

import os

import jax
import jax.numpy as jnp

from taiyaki_tpu import flipflopfings

# Scan unroll factor: amortizes per-iteration loop overhead on TPU.
_UNROLL = 8


def _use_pallas():
    """Use the Pallas lattice kernels on TPU (trace-time constant)."""
    if os.environ.get("TAIYAKI_TPU_NO_PALLAS") == "1":
        return False
    if os.environ.get("TAIYAKI_TPU_PALLAS_INTERPRET") == "1":
        # Force the Pallas path off-TPU (interpret mode): mesh parity tests.
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_score_fusion():
    """Fuse the score selection (and the posterior scatter) into the
    Pallas lattice kernels: the kernels stream lp [T,B,S] and keep the
    per-row selectors VMEM-resident, so the [T,B,L] stay/move/posterior
    streams never exist in HBM and all four selection/scatter einsums
    disappear (measured free in-kernel: misc/crf_fusion_probe.py).

    Numerics: identical to the default unfused path — the one-hot dot at
    Mosaic DEFAULT precision rounds each selected f32 score to bf16
    exactly like the unfused path's explicit bf16 score streams.  Under
    TAIYAKI_TPU_F32_SCORES=1 (exact-score mode: inference CLIs, parity
    tests) selection falls back to the unfused HIGHEST einsums.
    TAIYAKI_TPU_NO_SCORE_FUSE=1 forces the unfused path for A/Bs."""
    if not _use_pallas():
        return False
    if os.environ.get("TAIYAKI_TPU_NO_SCORE_FUSE") == "1":
        return False
    if os.environ.get("TAIYAKI_TPU_F32_SCORES") == "1":
        return False
    return True


def _score_stream_dtype():
    """Storage dtype for the stay/move score streams fed to the Pallas
    lattice kernels.  bf16 halves the dominant CRF HBM traffic (kernel
    arithmetic stays f32); it perturbs loss values by ~1e-3 relative
    (rounding of the scores entering the DP).  TAIYAKI_TPU_F32_SCORES=1
    restores exact-f32 values."""
    if os.environ.get("TAIYAKI_TPU_F32_SCORES") == "1":
        return jnp.float32
    return jnp.bfloat16


def _pad_axis(x, axis, multiple, value):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pallas_lattice_inputs(stay_all, move_all, valid, block_t, dtype=None):
    """Pad lattice streams for the Pallas kernels.

    L pads to a lane multiple (128); T pads to block_t with no-op blocks
    (stay = 0, move = -inf leave the carry and score unchanged).  Streams
    are stored as `dtype` (default `_score_stream_dtype()`).
    """
    # -1e30 pad is exact in bf16 (f32 exponent range)
    sdt = dtype or _score_stream_dtype()
    stay_p = _pad_axis(_pad_axis(stay_all.astype(sdt), 2, 128, 0.0),
                       0, block_t, 0.0)
    move_p = _pad_axis(_pad_axis(move_all.astype(sdt), 2, 128, _NEG),
                       0, block_t, _NEG)
    valid_p = _pad_axis(valid.astype(jnp.int32), 1, 128, 0)
    return stay_p, move_p, valid_p

# Lattice value for impossible states.  Large enough to never win a max,
# small enough that sums of T of them stay finite in float32.
_NEG = -1e30


def _nbase_from_ntrans(ntrans):
    return flipflopfings.nbase_flipflop(ntrans)


def make_seq_indices(seqs, nbase):
    """Stay/move transition indices for a padded batch of flip-flop codes.

    Device-side equivalent of flipflopfings.move_indices/stay_indices
    applied per row.

    Args:
        seqs: int array [batch, npos] of flip-flop codes, padded arbitrarily
            beyond each sequence's length (padding values must still be valid
            codes, e.g. 0).
        nbase: number of canonical bases.

    Returns:
        (stay_idx [batch, npos], move_idx [batch, npos-1]) int32 arrays.
    """
    seqs = jnp.asarray(seqs)
    nff = 2 * nbase
    stay_idx = seqs + jnp.minimum(seqs, nbase) * nff
    move_idx = seqs[:, :-1] + jnp.minimum(seqs[:, 1:], nbase) * nff
    return stay_idx.astype(jnp.int32), move_idx.astype(jnp.int32)


def _make_selectors(stay_idx, move_idx, modmove_idx, modmove_fact, nstate):
    """One-hot selector tensors for the lattice gathers/scatters.

    TPU note: `take_along_axis`/scatter-add with per-batch index matrices
    lowers to generic gather/scatter, which is catastrophically slow on TPU
    (~100x the whole network forward).  Expressed as one-hot einsums the
    same selections ride the MXU; the selectors are built once per loss
    call outside the time scan.

    Returns:
        (sel_stay [batch, npos, nstate], sel_move [batch, npos-1, nstate])
        where sel_move folds in the cat_mod weighted mod columns.
    """
    sel_stay = jax.nn.one_hot(stay_idx, nstate, dtype=jnp.float32)
    sel_move = jax.nn.one_hot(move_idx, nstate, dtype=jnp.float32)
    if modmove_idx is not None:
        sel_move = sel_move + (modmove_fact[..., None]
                               * jax.nn.one_hot(modmove_idx, nstate,
                                                dtype=jnp.float32))
    return sel_stay, sel_move


def _select_all_scores(lp, sel_stay, sel_move):
    """Stay/move lattice scores for ALL blocks in one batched GEMM.

    Contracting outside the time scan turns the per-step work into pure
    elementwise VPU math and gives the MXU one well-shaped [T,S]x[S,L]
    matmul per batch element instead of 2*T tiny ones.

    lp: [nblk, batch, nstate] -> ([nblk, batch, npos],
                                  [nblk, batch, npos-1]).

    These einsums are GATHERS in matmul clothing: precision must be
    HIGHEST or the TPU's default single bf16 MXU pass quantizes every
    selected score to bf16 (~3 significant digits), biasing the loss
    itself by ~2e-4 on the reference C kernel's self-test fixture.
    """
    stay_all = jnp.einsum("tbs,bls->tbl", lp, sel_stay,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    move_all = jnp.einsum("tbs,bls->tbl", lp, sel_move,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    return stay_all, move_all


def _forward_scores(lp, stay_idx, move_idx, modmove_idx, modmove_fact,
                    seqlens, collect_lattice):
    """Forward DP over the flip-flop lattice.

    Args:
        lp: [nblk, batch, nstate] transition weights (already sharpened).
        stay_idx/move_idx/modmove_idx/modmove_fact: see make_seq_indices.
        seqlens: [batch] int — actual sequence lengths (<= npos).
        collect_lattice: also return the renormalized forward lattice before
            each block, [nblk, batch, npos] (needed by the gradient pass).

    Returns:
        (score [batch], lattice or None)
    """
    nstate = lp.shape[2]
    npos = stay_idx.shape[1]
    pos = jnp.arange(npos)[None, :]
    valid = pos < seqlens[:, None]                        # [batch, npos]
    if _use_score_fusion():
        setup = _fused_setup(lp, stay_idx, move_idx, modmove_idx,
                             modmove_fact, valid)
        if setup is not None:
            pallas_crf, bb, bt, idxs, lp_p, valid_p = setup
            fwd_final, score, lattice = pallas_crf.crf_forward_fused(
                lp_p, *idxs, valid_p, block_b=bb, block_t=bt,
                residual_dtype=jnp.bfloat16,
                emit_lattice=collect_lattice, true_len=lp.shape[0],
                unroll=True)
            last = jnp.clip(seqlens - 1, 0, npos - 1)
            score = score + jnp.take_along_axis(
                fwd_final[:, :npos], last[:, None], axis=1)[:, 0]
            return score, lattice
    sel_stay, sel_move = _make_selectors(stay_idx, move_idx, modmove_idx,
                                         modmove_fact, nstate)
    stay_all, move_all = _select_all_scores(lp, sel_stay, sel_move)
    return _forward_scores_streams(stay_all, move_all, valid, seqlens,
                                   collect_lattice)


def _fused_setup(lp, stay_idx, move_idx, modmove_idx, modmove_fact, valid):
    """Shared prep for the fused-selection kernels: lane-pad the lattice
    width and the transition-index vectors (out-of-range padding selects
    nothing), pick the VMEM-fitting (block_b, block_t) tile, zero-pad
    lp's time axis.  Returns None when no tile fits (huge L or
    non-divisible batch) — callers fall back to the unfused
    einsum+stream path."""
    from taiyaki_tpu.ops import pallas_crf
    nblk, nbatch, nstate = lp.shape
    npos = stay_idx.shape[1]
    L = npos + ((-npos) % 128)
    tile = pallas_crf.fused_tile(nbatch, nstate, L)
    if tile is None:
        return None
    bb, bt = tile

    def pad_to_L(x, value):
        n = x.shape[1]
        if n < L:
            x = jnp.pad(x, [(0, 0), (0, L - n)], constant_values=value)
        return x

    sidx = pad_to_L(stay_idx.astype(jnp.int32), nstate)
    midx = pad_to_L(move_idx.astype(jnp.int32), nstate)
    if modmove_idx is None:
        mmidx = jnp.full((nbatch, L), nstate, jnp.int32)
        mmfact = jnp.zeros((nbatch, L), jnp.float32)
    else:
        mmidx = pad_to_L(modmove_idx.astype(jnp.int32), nstate)
        mmfact = pad_to_L(modmove_fact.astype(jnp.float32), 0.0)
    lp_p = _pad_axis(lp.astype(jnp.float32), 0, bt, 0.0)
    valid_p = _pad_axis(valid.astype(jnp.int32), 1, 128, 0)
    return (pallas_crf, bb, bt, (sidx, midx, mmidx, mmfact), lp_p,
            valid_p)


def _forward_scores_streams(stay_all, move_all, valid, seqlens,
                            collect_lattice):
    """Forward DP given the selected per-position score streams (so the
    gradient pass, which also needs the streams, computes them once)."""
    nblk, nbatch, npos = stay_all.shape
    pos = jnp.arange(npos)[None, :]

    fwd0 = jnp.where(pos == 0, 0.0, _NEG)
    fwd0 = jnp.where(valid, fwd0, _NEG).astype(jnp.float32)
    fwd0 = jnp.broadcast_to(fwd0, (nbatch, npos))

    if _use_pallas():
        from taiyaki_tpu.ops import pallas_crf
        bt = pallas_crf.fwd_block_t(nbatch)
        stay_p, move_p, valid_p = _pallas_lattice_inputs(
            stay_all, move_all, valid, bt)
        # lattice is a gradient-only residual: bf16 halves its HBM stream
        fwd_final, score, lattice = pallas_crf.crf_forward(
            stay_p, move_p, valid_p, block_t=bt,
            residual_dtype=jnp.bfloat16, unroll=True)
        last = jnp.clip(seqlens - 1, 0, npos - 1)
        score = score + jnp.take_along_axis(
            fwd_final[:, :npos], last[:, None], axis=1)[:, 0]
        return score, (lattice if collect_lattice else None)

    def step(carry, xs):
        fwd, score = carry
        stay_sc, move_sc = xs
        stay_part = fwd + stay_sc
        move_part = jnp.concatenate(
            [jnp.full((nbatch, 1), _NEG, fwd.dtype),
             fwd[:, :-1] + move_sc], axis=1)
        new = jnp.logaddexp(stay_part, move_part)
        new = jnp.where(valid, new, _NEG)
        factor = jnp.max(new, axis=1)
        new = jnp.where(valid, new - factor[:, None], _NEG)
        return (new, score + factor), (fwd if collect_lattice else None)

    (fwd_final, score), lattice = jax.lax.scan(
        step, (fwd0, jnp.zeros(nbatch, jnp.float32)),
        (stay_all, move_all), unroll=_UNROLL)
    last = jnp.clip(seqlens - 1, 0, npos - 1)
    score = score + jnp.take_along_axis(fwd_final, last[:, None], axis=1)[:, 0]
    return score, lattice


def _grad_scores(lp, stay_idx, move_idx, modmove_idx, modmove_fact, seqlens):
    """Score and d(score)/d(lp) via forward + reverse posterior pass.

    Mirrors crf_flipflop_grad / cm_flipflop_grad: per block, the posterior
    over the 2*npos-1 lattice transitions is the softmax of
    fwd[blk] + bwd[blk+1] + transition score, scatter-added into the
    transition-weight gradient (c_crf_flipflop.c:372-432).
    """
    nblk, nbatch, nstate = lp.shape
    npos = stay_idx.shape[1]
    pos = jnp.arange(npos)[None, :]
    valid = pos < seqlens[:, None]
    valid_move = pos[:, :-1] < (seqlens[:, None] - 1)
    if _use_score_fusion():
        setup = _fused_setup(lp, stay_idx, move_idx, modmove_idx,
                             modmove_fact, valid)
        if setup is not None:
            pallas_crf, bb, bt, idxs, lp_p, valid_p = setup
            fwd_final, score, lattice = pallas_crf.crf_forward_fused(
                lp_p, *idxs, valid_p, block_b=bb, block_t=bt,
                residual_dtype=jnp.bfloat16, emit_lattice=True,
                true_len=nblk, unroll=True)
            last = jnp.clip(seqlens - 1, 0, npos - 1)
            score = score + jnp.take_along_axis(
                fwd_final[:, :npos], last[:, None], axis=1)[:, 0]
            grad = pallas_crf.crf_backward_fused(
                lp_p, *idxs, lattice, valid_p,
                last[:, None].astype(jnp.int32), block_b=bb, block_t=bt,
                true_len=nblk, unroll=True)
            return score, grad[:nblk]
    sel_stay, sel_move = _make_selectors(stay_idx, move_idx, modmove_idx,
                                         modmove_fact, nstate)
    stay_all, move_all = _select_all_scores(lp, sel_stay, sel_move)

    score, fwd_lattice = _forward_scores_streams(
        stay_all, move_all, valid, seqlens, collect_lattice=True)
    last = jnp.clip(seqlens - 1, 0, npos - 1)

    if _use_pallas():
        from taiyaki_tpu.ops import pallas_crf
        # The forward lattice was padded with fwd_block_t; the (smaller,
        # also power-of-two) backward block always divides that padding.
        bt = pallas_crf.fwd_block_t(nbatch)
        stay_p, move_p, valid_p = _pallas_lattice_inputs(
            stay_all, move_all, valid, bt)
        post_stay, post_move = pallas_crf.crf_backward_posteriors(
            stay_p, move_p, fwd_lattice, valid_p,
            last[:, None].astype(jnp.int32),
            block_t=pallas_crf.bwd_block_t(nbatch),
            out_dtype=jnp.bfloat16, unroll=True)
        post_stay = post_stay[:nblk, :, :npos]
        post_move = post_move[:nblk, :, :npos - 1]
        grad = (jnp.einsum("tbl,bls->tbs", post_stay, sel_stay,
                           preferred_element_type=jnp.float32)
                + jnp.einsum("tbl,bls->tbs", post_move, sel_move,
                             preferred_element_type=jnp.float32))
        return score, grad

    # Backward lattice init: paths end at the final position.
    bwd0 = jnp.where((pos == last[:, None]) & valid, 0.0, _NEG)
    bwd0 = jnp.broadcast_to(bwd0.astype(jnp.float32), (nbatch, npos))

    def step(bwd_next, xs):
        stay_sc, move_sc, fwd_curr = xs

        # Posterior over this block's transitions (softmax over the
        # 2*npos-1 stay+move lattice entries).
        stay_terms = jnp.where(valid, fwd_curr + bwd_next + stay_sc, _NEG)
        move_terms = jnp.where(
            valid_move, fwd_curr[:, :-1] + bwd_next[:, 1:] + move_sc, _NEG)
        terms = jnp.concatenate([stay_terms, move_terms], axis=1)
        tmax = jnp.max(terms, axis=1, keepdims=True)
        ex = jnp.exp(terms - tmax)
        ex = jnp.where(terms > _NEG / 2, ex, 0.0)
        denom = jnp.sum(ex, axis=1, keepdims=True)
        post = jnp.where(denom > 0, ex / jnp.maximum(denom, 1e-38), 0.0)

        # Backward recursion to the previous block boundary.
        stay_part = stay_sc + bwd_next
        move_part = jnp.concatenate(
            [move_sc + bwd_next[:, 1:],
             jnp.full((nbatch, 1), _NEG, bwd_next.dtype)], axis=1)
        new = jnp.logaddexp(stay_part, move_part)
        new = jnp.where(valid, new, _NEG)
        factor = jnp.max(new, axis=1, keepdims=True)
        new = jnp.where(valid, new - factor, _NEG)
        return new, post

    _, post_all = jax.lax.scan(
        step, bwd0, (stay_all, move_all, fwd_lattice), reverse=True,
        unroll=_UNROLL)
    # Scatter-add over all blocks in two batched GEMMs (the transposed
    # one-hot contraction; sel_move folds the weighted cat_mod columns).
    grad = (jnp.einsum("tbl,bls->tbs", post_all[:, :, :npos], sel_stay,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("tbl,bls->tbs", post_all[:, :, npos:], sel_move,
                         preferred_element_type=jnp.float32))
    return score, grad


def _masked_cost(score, seqlens, nblk):
    """cost = -score / nblk; zero for empty sequences (c_crf_flipflop.c:270)."""
    cost = -score / nblk
    return jnp.where(seqlens > 0, cost, 0.0)


# -- canonical flip-flop loss ------------------------------------------------

@jax.custom_vjp
def _crf_loss_core(lp, stay_idx, move_idx, seqlens):
    nblk = lp.shape[0]
    score, _ = _forward_scores(lp, stay_idx, move_idx, None, None, seqlens,
                               collect_lattice=False)
    return _masked_cost(score, seqlens, nblk)


def _crf_loss_fwd(lp, stay_idx, move_idx, seqlens):
    nblk = lp.shape[0]
    score, grad = _grad_scores(lp, stay_idx, move_idx, None, None, seqlens)
    cost = _masked_cost(score, seqlens, nblk)
    return cost, (grad, seqlens, nblk)


def _crf_loss_bwd(res, g):
    grad, seqlens, nblk = res
    # d(cost)/d(lp) = -posterior/nblk, zeroed for empty sequences.
    glp = (-grad / nblk) * jnp.where(seqlens > 0, g, 0.0)[None, :, None]
    return glp, None, None, None


_crf_loss_core.defvjp(_crf_loss_fwd, _crf_loss_bwd)


def crf_flipflop_loss(logprob, seqs, seqlens, sharpfact=1.0):
    """Flip-flop CRF negative-log-conditional-probability per batch element.

    TPU-native equivalent of ctc.crf_flipflop_loss (taiyaki/ctc/ctc.pyx:116).

    Args:
        logprob: [nblk, batch, nstate] float transition weights (nstate =
            2*nbase*(nbase+1); NOT normalized — pair with flipflop_logz).
        seqs: [batch, npos] int flip-flop codes, padded to a common length.
        seqlens: [batch] int actual sequence lengths.
        sharpfact: sharpening factor applied to scores pre-DP; cost is
            divided by it post-DP.

    Returns:
        [batch] float32 costs = -score / nblk (per-block mean, making
        gradients comparable across chunk lengths; train_flipflop.py:178-182).
    """
    ntrans = logprob.shape[2]
    nbase = _nbase_from_ntrans(ntrans)
    stay_idx, move_idx = make_seq_indices(seqs, nbase)
    lp = (sharpfact * logprob).astype(jnp.float32)
    return _crf_loss_core(lp, stay_idx, move_idx,
                          jnp.asarray(seqlens)) / sharpfact


# -- categorical-modified-base flip-flop loss --------------------------------

@jax.custom_vjp
def _cat_mod_loss_core(lp, stay_idx, move_idx, modmove_idx, modmove_fact,
                       seqlens):
    nblk = lp.shape[0]
    score, _ = _forward_scores(lp, stay_idx, move_idx, modmove_idx,
                               modmove_fact, seqlens, collect_lattice=False)
    return _masked_cost(score, seqlens, nblk)


def _cat_mod_loss_fwd(lp, stay_idx, move_idx, modmove_idx, modmove_fact,
                      seqlens):
    nblk = lp.shape[0]
    score, grad = _grad_scores(lp, stay_idx, move_idx, modmove_idx,
                               modmove_fact, seqlens)
    cost = _masked_cost(score, seqlens, nblk)
    return cost, (grad, seqlens, nblk)


def _cat_mod_loss_bwd(res, g):
    grad, seqlens, nblk = res
    glp = (-grad / nblk) * jnp.where(seqlens > 0, g, 0.0)[None, :, None]
    return glp, None, None, None, None, None


_cat_mod_loss_core.defvjp(_cat_mod_loss_fwd, _cat_mod_loss_bwd)


def cat_mod_flipflop_loss(logprob, seqs, seqlens, mod_cats, can_mods_offsets,
                          mod_cat_weights, sharpfact=1.0):
    """Flip-flop CRF loss with categorical modified-base scores.

    TPU-native equivalent of ctc.cat_mod_flipflop_loss
    (taiyaki/ctc/ctc.pyx:258-312).  Each *move* into sequence position p
    additionally accrues weight * logprob[mod_column(p)], where the mod
    column encodes (canonical base of p, mod category of p) at offsets
    >= 2*nbase*(nbase+1) in the output layer.

    Sharpening applies only to the canonical transition columns; the
    returned gradient matches the reference's convention of being evaluated
    at the sharpened scores (ctc.pyx:265-269,300-312).

    Args:
        logprob: [nblk, batch, nstate] with nstate = 2*nbase*(nbase+1) + 1 +
            total mod count.
        seqs: [batch, npos] padded flip-flop codes.
        seqlens: [batch] sequence lengths.
        mod_cats: [batch, npos] mod category per position (0 = canonical).
        can_mods_offsets: [nbase + 1] int — offset of each canonical base's
            group within the mod score stream (cumsum of 1 + nmods).
        mod_cat_weights: [1 + total mods] float per-mod loss weights.
        sharpfact: canonical-column sharpening factor.

    Returns:
        [batch] float32 costs.
    """
    import numpy as _np
    ntrans = logprob.shape[2]
    # can_mods_offsets is static model structure (numpy); the width split
    # must stay concrete under jit.
    n_can_trans = ntrans - int(_np.asarray(can_mods_offsets)[-1])
    nbase = _nbase_from_ntrans(n_can_trans)
    can_mods_offsets = jnp.asarray(can_mods_offsets)

    stay_idx, move_idx = make_seq_indices(seqs, nbase)
    # Mod score column for each *entered* position p >= 1.
    mod_seq = (can_mods_offsets[jnp.mod(seqs[:, 1:], nbase)]
               + mod_cats[:, 1:])
    modmove_idx = (n_can_trans + mod_seq).astype(jnp.int32)
    modmove_fact = jnp.asarray(mod_cat_weights)[mod_seq].astype(jnp.float32)

    trans_sharp = jnp.where(jnp.arange(ntrans) < n_can_trans, sharpfact, 1.0)
    lp = (logprob * trans_sharp).astype(jnp.float32)
    # Reference gradient convention (CatModFlipFlop.backward,
    # ctc.pyx:305-312): the returned gradient is the core DP gradient
    # evaluated AT the sharpened scores, with neither the trans_sharp
    # chain factor nor the /sharpfact division applied.  Plain autodiff
    # through lp and the division reproduces that only for canonical
    # columns (where the factors cancel); mod columns would pick up a
    # spurious 1/sharpfact.  Make both value-only (straight-through):
    lp32 = logprob.astype(jnp.float32)
    lp = lp32 + jax.lax.stop_gradient(lp - lp32)
    core = _cat_mod_loss_core(lp, stay_idx, move_idx, modmove_idx,
                              modmove_fact, jnp.asarray(seqlens))
    return core + jax.lax.stop_gradient(core / sharpfact - core)


# -- partition function ------------------------------------------------------

def _logz_pad_scores(scores, block_t, dtype=None):
    """[T, B, ntrans] -> [T_pad, B, 128] with -inf lane padding and
    identity (stay-only) blocks for the T padding.  Stored as `dtype`
    (default `_score_stream_dtype()`)."""
    from taiyaki_tpu.ops import pallas_logz
    nblk, nbatch, ntrans = scores.shape
    nbase = _nbase_from_ntrans(ntrans)
    sdt = dtype or _score_stream_dtype()
    scores_p = _pad_axis(scores.astype(sdt), 2, pallas_logz.LANES, _NEG)
    t_pad = (-nblk) % block_t
    if t_pad:
        _, _, stay_cols = pallas_logz.selectors(nbase)
        ident = jnp.full((pallas_logz.LANES,), _NEG, sdt)
        ident = ident.at[jnp.asarray(stay_cols)].set(0.0)
        pad = jnp.broadcast_to(ident, (t_pad, nbatch, pallas_logz.LANES))
        scores_p = jnp.concatenate([scores_p, pad], axis=0)
    return scores_p


@jax.custom_vjp
def _logz_pallas(scores):
    # Primal-only call (no vjp will consume residuals): skip the
    # [T, B, 128] lattice stream entirely — basecall make_trans and
    # validation eval_loss hit this path every call.
    from taiyaki_tpu.ops import pallas_logz
    nblk, nbatch, ntrans = scores.shape
    nbase = _nbase_from_ntrans(ntrans)
    bt = pallas_logz.block_t_for(nbatch)
    scores_p = _logz_pad_scores(scores, bt)
    _, logz, _ = pallas_logz.logz_forward(
        scores_p, nbase, block_t=bt, unroll=True, emit_lattice=False)
    return logz


def _logz_pallas_fwd(scores):
    from taiyaki_tpu.ops import pallas_logz
    nblk, nbatch, ntrans = scores.shape
    nbase = _nbase_from_ntrans(ntrans)
    bt = pallas_logz.block_t_for(nbatch)
    scores_p = _logz_pad_scores(scores, bt)
    # lattice is a gradient-only residual: bf16 halves its HBM stream
    _, logz, lattice = pallas_logz.logz_forward(
        scores_p, nbase, block_t=bt, residual_dtype=jnp.bfloat16,
        unroll=True)
    # kernel starts from a renormalized initial state; the scan version
    # counts the initial logsumexp(init) = log(nbase) in its total
    logz = logz + jnp.log(float(nbase))
    return logz, (scores_p, lattice, nblk, ntrans, nbase)


def _logz_pallas_bwd(res, g):
    from taiyaki_tpu.ops import pallas_logz
    scores_p, lattice, nblk, ntrans, nbase = res
    bt = pallas_logz.block_t_for(scores_p.shape[1])
    post = pallas_logz.logz_backward_posteriors(scores_p, lattice, nbase,
                                                block_t=bt,
                                                out_dtype=jnp.bfloat16,
                                                unroll=True)
    return (post[:nblk, :, :ntrans].astype(jnp.float32)
            * g[None, :, None],)


_logz_pallas.defvjp(_logz_pallas_fwd, _logz_pallas_bwd)


def flipflop_logz(scores):
    """Log partition function of the flip-flop transition lattice.

    Differentiable scan equivalent of layers.log_partition_flipflop
    (taiyaki/layers.py:1277-1299) / the cupy LogZ kernel
    (cupy_extensions/flipflop.py:338-354).  The 2*nbase state vector is
    advanced one block at a time: scores reshape to
    [batch, nbase+1, 2*nbase] destination groups — group d < nbase collects
    all sources into flip base d; group nbase holds flip->flop (same base)
    moves and flop stays.

    Args:
        scores: [nblk, batch, nstate] transition weights (canonical columns
            only for cat_mod models).

    Returns:
        [batch] float32 log partition values.
    """
    nblk, nbatch, ntrans = scores.shape
    nbase = _nbase_from_ntrans(ntrans)

    if _use_pallas():
        return _logz_pallas(scores)

    init = jnp.concatenate(
        [jnp.zeros((nbatch, nbase), jnp.float32),
         jnp.full((nbatch, nbase), _NEG, jnp.float32)], axis=1)
    logz0 = jax.nn.logsumexp(init, axis=1)
    init = init - logz0[:, None]

    def step(carry, scores_t):
        fwd, logz = carry
        curr = fwd[:, None, :] + scores_t.reshape(nbatch, nbase + 1, 2 * nbase)
        flip_states = jax.nn.logsumexp(curr[:, :nbase, :], axis=2)
        flop_states = jnp.logaddexp(curr[:, nbase, :nbase],
                                    curr[:, nbase, nbase:])
        new = jnp.concatenate([flip_states, flop_states], axis=1)
        factor = jax.nn.logsumexp(new, axis=1)
        return (new - factor[:, None], logz + factor), None

    (_, logz), _ = jax.lax.scan(
        step, (init, logz0), scores.astype(jnp.float32), unroll=_UNROLL)
    return logz


# Name used by the reference's training loop (layers.flipflop_logpartition).
log_partition_flipflop = flipflop_logz
