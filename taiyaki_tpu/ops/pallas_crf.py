"""Pallas TPU kernels for the flip-flop CRF lattice recursions.

Completes the survey's flagship design goal: the reference's C/AVX
forward-backward DP (taiyaki/ctc/c_crf_flipflop.c) as on-device TPU
kernels.  The surrounding one-hot GEMMs (score selection, gradient
scatter) stay in XLA where the MXU already handles them; these kernels
replace only the sequential time recursions, keeping the [B, L] lattice
carry in VMEM across the grid.

Shapes are padded by the caller: L to a lane multiple, T to a block_t
multiple (padding rows masked via `valid`).  Numerics are identical to
the lax.scan path in ops/flipflop.py (per-block max renormalization,
posterior softmax over 2L-1 transitions).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taiyaki_tpu.ops.pallas_common import interp, run_steps

_NEG = -1e30
DEFAULT_BLOCK_T = 8
# The backward kernel streams 3 inputs + 2 outputs; block_t=4 keeps its
# double-buffered VMEM footprint under the 16MB budget at L=768, B=64.
BWD_BLOCK_T = 4

# Batch rows per grid iteration: the batch axis is tiled across an OUTER
# grid dimension (per-tile lattice carry in VMEM scratch; TPU grids are
# sequential), so VMEM per grid step is bounded by the tuned B=64 budget
# regardless of total batch — bs1024, which OOM'd the untiled backward
# kernel by 11.5MB, fits.  Per-row lattice math is independent, so
# tiling cannot change results.  Tiles of 256 keep B <= 256 identical
# to the pre-tiling configuration (64-row tiles measured -5% at bs256).
BLOCK_B = 256


def block_b_for(batch_size):
    """Largest of {256, 128, ..., 8} dividing the batch; falls back to the
    full batch for small/odd batches (unlike the RNN kernels these have
    no reshape constraint, so any batch compiles)."""
    bb = BLOCK_B
    while bb > 8 and batch_size % bb != 0:
        bb //= 2
    if batch_size % bb != 0:
        return batch_size
    return min(bb, batch_size)


def _scaled_block_t(base, batch_size):
    """block_t (power-of-two) for the VMEM budget the base values were
    tuned for, applied to this batch's TILE size."""
    bb = block_b_for(batch_size)
    bt = base
    while bt > 1 and bt * bb > 64 * base:
        bt //= 2
    return bt


def fwd_block_t(batch_size):
    return _scaled_block_t(DEFAULT_BLOCK_T, batch_size)


def bwd_block_t(batch_size):
    return _scaled_block_t(BWD_BLOCK_T, batch_size)


def _fwd_kernel(stay_ref, move_ref, valid_ref, fwd_out, score_out,
                lattice_ref, fwd_carry, score_carry, *, block_t, unroll=False):
    @pl.when(pl.program_id(1) == 0)
    def _():
        valid = valid_ref[:]
        B, L = fwd_carry.shape
        pos0 = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) == 0
        fwd_carry[:] = jnp.where(pos0 & (valid > 0), 0.0, _NEG)
        score_carry[:] = jnp.zeros_like(score_carry)

    def body(k, _):
        fwd = fwd_carry[:]
        valid = valid_ref[:] > 0
        lattice_ref[k] = fwd.astype(lattice_ref.dtype)
        stay_part = fwd + stay_ref[k].astype(jnp.float32)
        # move into position p from p-1: shift fwd right by one position
        shifted = pltpu.roll(fwd, 1, 1)
        # astype before roll: Mosaic's dynamic_rotate is 32-bit only
        move_sc = pltpu.roll(move_ref[k].astype(jnp.float32), 1, 1)
        B, L = fwd.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        move_part = jnp.where(col == 0, _NEG, shifted + move_sc)
        new = jnp.logaddexp(stay_part, move_part)
        new = jnp.where(valid, new, _NEG)
        factor = jnp.max(new, axis=1, keepdims=True)
        fwd_carry[:] = jnp.where(valid, new - factor, _NEG)
        score_carry[:] = score_carry[:] + factor
        return 0

    run_steps(body, block_t, unroll)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        fwd_out[:] = fwd_carry[:]
        score_out[:] = score_carry[:]


def crf_forward(stay_all, move_all, valid, block_t=DEFAULT_BLOCK_T,
                interpret=False, residual_dtype=None, unroll=False):
    """Forward lattice pass.

    Args:
        stay_all: [T, B, L] stay scores (padded; invalid cols arbitrary).
        move_all: [T, B, L] scores for the move p -> p+1 (column p;
            column L-1 unused).
        valid: [B, L] int32 mask (1 = position within sequence).
        residual_dtype: storage dtype for the lattice (a gradient-only
            residual; score/fwd_final stay float32).

    Returns:
        (fwd_final [B, L], score [B] — sum of renorm factors,
         lattice [T, B, L] — renormalized fwd before each block)
    """
    T, B, L = stay_all.shape
    res_dt = residual_dtype or stay_all.dtype
    assert T % block_t == 0
    bb = block_b_for(B)
    nb = B // bb
    kernel = functools.partial(_fwd_kernel, block_t=block_t, unroll=unroll)
    fwd_final, score, lattice = pl.pallas_call(
        kernel,
        grid=(nb, T // block_t),
        in_specs=[
            pl.BlockSpec((block_t, bb, L), lambda ib, it: (it, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, L), lambda ib, it: (it, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, L), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, L), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, L), lambda ib, it: (it, ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, B, L), res_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, L), jnp.float32),
            pltpu.VMEM((bb, 1), jnp.float32),
        ],
        interpret=interp(interpret),
    )(stay_all, move_all, valid)
    return fwd_final, score[:, 0], lattice


def _bwd_kernel(stay_ref, move_ref, lattice_ref, valid_ref, last_ref,
                post_stay_ref, post_move_ref, bwd_carry, *, block_t, unroll=False):
    B, L = bwd_carry.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        valid = valid_ref[:] > 0
        bwd_carry[:] = jnp.where((col == last_ref[:]) & valid, 0.0, _NEG)

    def body(j, _):
        k = block_t - 1 - j
        valid = valid_ref[:] > 0
        bwd_next = bwd_carry[:]
        stay_sc = stay_ref[k].astype(jnp.float32)
        move_sc = move_ref[k].astype(jnp.float32)
        fwd_curr = lattice_ref[k].astype(jnp.float32)

        # posterior over the 2L-1 transitions of this block
        stay_terms = jnp.where(valid, fwd_curr + bwd_next + stay_sc, _NEG)
        # move p -> p+1 uses bwd_next shifted left by one (roll takes only
        # non-negative shifts: left-by-1 == right-by-L-1)
        bwd_shift = pltpu.roll(bwd_next, L - 1, 1)
        move_valid = valid & (col < last_ref[:])
        move_terms = jnp.where(move_valid,
                               fwd_curr + bwd_shift + move_sc, _NEG)
        tmax = jnp.maximum(jnp.max(stay_terms, axis=1, keepdims=True),
                           jnp.max(move_terms, axis=1, keepdims=True))
        ex_stay = jnp.where(stay_terms > _NEG / 2,
                            jnp.exp(stay_terms - tmax), 0.0)
        ex_move = jnp.where(move_terms > _NEG / 2,
                            jnp.exp(move_terms - tmax), 0.0)
        denom = (jnp.sum(ex_stay, axis=1, keepdims=True)
                 + jnp.sum(ex_move, axis=1, keepdims=True))
        # NOT jnp.maximum(denom, 1e-38): 1e-38 is subnormal in f32 and
        # XLA's flush-to-zero turns it into 0, making this 0/0 = NaN for
        # rows with no reachable path (seqlen > nblk + 1) — such rows
        # must emit an all-zero posterior like the scan path
        # (ops/flipflop.py:296).
        denom = jnp.where(denom > 0, denom, 1.0)
        post_stay_ref[k] = (ex_stay / denom).astype(post_stay_ref.dtype)
        post_move_ref[k] = (ex_move / denom).astype(post_move_ref.dtype)

        # backward recursion
        stay_part = stay_sc + bwd_next
        move_part = jnp.where(move_valid, move_sc + bwd_shift, _NEG)
        new = jnp.logaddexp(stay_part, move_part)
        new = jnp.where(valid, new, _NEG)
        factor = jnp.max(new, axis=1, keepdims=True)
        bwd_carry[:] = jnp.where(valid, new - factor, _NEG)
        return 0

    run_steps(body, block_t, unroll)


def crf_backward_posteriors(stay_all, move_all, lattice, valid, last,
                            block_t=BWD_BLOCK_T, interpret=False,
                            out_dtype=None, unroll=False):
    """Backward pass emitting per-block transition posteriors.

    Args:
        stay_all/move_all: as in crf_forward.
        lattice: [T, B, L] renormalized forward states (crf_forward).
        valid: [B, L] int32 mask.
        last: [B, 1] int32 — seqlen - 1 per batch row.

    Returns:
        (post_stay [T, B, L], post_move [T, B, L]) — post_move column p is
        the posterior of the move p -> p+1.
    """
    T, B, L = stay_all.shape
    o_dt = out_dtype or stay_all.dtype
    assert T % block_t == 0
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    kernel = functools.partial(_bwd_kernel, block_t=block_t, unroll=unroll)

    def rev(ib, it):
        return (ngrid - 1 - it, ib, 0)

    return pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, bb, L), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, L), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, L), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, L), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, bb, L), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, L), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, L), o_dt),
            jax.ShapeDtypeStruct((T, B, L), o_dt),
        ],
        scratch_shapes=[pltpu.VMEM((bb, L), jnp.float32)],
        interpret=interp(interpret),
    )(stay_all, move_all, lattice, valid, last)


# -- fused score selection ----------------------------------------------------
#
# The stay/move lattice scores are one-hot selections from the network's
# transition weights: stay[t,b,l] = lp[t,b,stay_idx[b,l]].  The unfused
# path materializes them with XLA einsums ([T,B,L] x2 through HBM, read
# back by both lattice kernels, ~3.3-4.3 ms/pair at the production
# shape).  Because the selector matrix differs PER BATCH ROW, fusing the
# selection into the lattice kernels needs a batched dot_general (batch
# dim = b) — and an on-chip probe (misc/crf_fusion_probe.py) measured
# that dot as FREE: +0.009 ms over pure streaming at T=800, B=256,
# L=512, S=40 (the MXU work hides completely under the stream DMAs).
#
# The selectors themselves are BUILT INSIDE the kernel, in VMEM scratch,
# from the [B, L] transition-index vectors (one broadcast-compare per
# batch tile at its first grid step).  Passing them as inputs instead
# measured a 23.8M scoped-vmem OOM at block_b=128: Mosaic double-buffers
# inputs even when their block index never changes, and 2x two [bb,S,L]
# selectors is the whole budget.  Scratch is single-buffered.
#
# The backward kernel also contracts its per-block posteriors with the
# same resident selectors (transposed contraction), emitting d(score)/
# d(lp) directly — the [T,B,L] posterior streams and both scatter
# einsums disappear as well (reference: the fused C gradient loop reads
# the scores exactly once, c_crf_flipflop.c:372-432).

def fused_tile(batch_size, nstate, L):
    """(block_b, block_t) for the selector-resident fused kernels, or
    None if nothing fits the VMEM budget (caller falls back to the
    unfused path).  The two bf16 selector scratches cost
    2 * bb * nstate * L * 2 bytes, single-buffered; the bf16 score and
    posterior scratches plus the double-buffered lattice stream take
    the rest of the 16 MB."""
    # 5.5M selector budget: the backward's scatter dot materializes
    # Mosaic stack temporaries proportional to the selector size, and
    # 6M let the cat_mod width (S=45 at L=512, bb=64) blow the 16M
    # scoped-vmem limit by 0.5M (measured on v5e; canonical S=40 fits).
    # 5.5M keeps canonical at bb=64 and drops cat_mod to bb=32.
    bb = BLOCK_B
    while bb > 8 and (batch_size % bb != 0
                      or 4 * bb * nstate * L > 5_500_000):
        bb //= 2
    if batch_size % bb != 0 or 4 * bb * nstate * L > 5_500_000:
        return None
    # Time blocking: bigger bt amortizes the per-block selection dots
    # and grid machinery.  The r5 CRF roofline (misc/crf_roofline.py)
    # measured bt=16 at the RNA shape (bb=16, L=1536, 3.1M of stream
    # blocks) -7% fwd / -11% bwd vs bt=8, while bt=16 at the DNA tile
    # (bb=64, L=512, 4.2M) exceeds scoped VMEM on v5e — the working
    # budget sits between, hence 3.5M.
    bt = 16
    while bt > 1 and 4 * bt * bb * L * 2 > 3_500_000:
        bt //= 2
    return bb, bt


def _build_selectors(stayidx_ref, moveidx_ref, modidx_ref, modfact_ref,
                     selstay_scr, selmove_scr):
    """Materialize this batch tile's transposed selectors [bb, S, L]
    into (single-buffered) VMEM scratch: one-hot over the S axis from
    the index vectors; the move selector adds the weighted cat_mod
    column (fact == 0 for canonical models).  Index L-padding uses an
    out-of-range value so padded columns come out all-zero.

    Built in static sublane-sized chunks over S: a whole-array build
    materializes several [bb, S, L] i32 temporaries at once and blows
    Mosaic's stack allocation (measured 34M scoped at bb=128, L=512)."""
    bb, S, L = selstay_scr.shape
    stay_idx = stayidx_ref[:][:, None, :]
    move_idx = moveidx_ref[:][:, None, :]
    mod_idx = modidx_ref[:][:, None, :]
    mod_fact = modfact_ref[:][:, None, :]
    CH = 8
    for s0 in range(0, S, CH):
        ch = min(CH, S - s0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (bb, ch, L), 1) + s0
        selstay_scr[:, s0:s0 + ch, :] = (stay_idx == iota).astype(
            selstay_scr.dtype)
        move = (move_idx == iota).astype(jnp.float32)
        move += mod_fact * (mod_idx == iota)
        selmove_scr[:, s0:s0 + ch, :] = move.astype(selmove_scr.dtype)


def _fused_scores(lp_ref, selstay_scr, selmove_scr, stay_scr, move_scr,
                  precision):
    """Select this block's stay/move scores into VMEM scratch: one
    batched one-hot dot per stream ([bb, bt, S] x [bb, S, L])."""
    lpb = jnp.transpose(lp_ref[:], (1, 0, 2))          # [bb, bt, S]
    dn = (((2,), (1,)), ((0,), (0,)))                  # contract S, batch b
    stay = jax.lax.dot_general(lpb, selstay_scr[:], dn,
                               preferred_element_type=jnp.float32,
                               precision=precision)
    move = jax.lax.dot_general(lpb, selmove_scr[:], dn,
                               preferred_element_type=jnp.float32,
                               precision=precision)
    stay_scr[:] = jnp.transpose(stay, (1, 0, 2)).astype(stay_scr.dtype)
    move_scr[:] = jnp.transpose(move, (1, 0, 2)).astype(move_scr.dtype)


def _fwd_fused_kernel(lp_ref, stayidx_ref, moveidx_ref, modidx_ref,
                      modfact_ref, valid_ref, fwd_out, score_out, *rest,
                      block_t, T, precision, emit_lattice, unroll=False):
    if emit_lattice:
        (lattice_ref, fwd_carry, score_carry, selstay_scr, selmove_scr,
         stay_scr, move_scr) = rest
    else:
        (fwd_carry, score_carry, selstay_scr, selmove_scr,
         stay_scr, move_scr) = rest
        lattice_ref = None

    @pl.when(pl.program_id(1) == 0)
    def _():
        valid = valid_ref[:]
        B, L = fwd_carry.shape
        pos0 = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) == 0
        fwd_carry[:] = jnp.where(pos0 & (valid > 0), 0.0, _NEG)
        score_carry[:] = jnp.zeros_like(score_carry)
        _build_selectors(stayidx_ref, moveidx_ref, modidx_ref,
                         modfact_ref, selstay_scr, selmove_scr)

    _fused_scores(lp_ref, selstay_scr, selmove_scr, stay_scr, move_scr,
                  precision)
    base = pl.program_id(1) * block_t

    def body(k, _):
        fwd = fwd_carry[:]
        valid = valid_ref[:] > 0
        if lattice_ref is not None:
            lattice_ref[k] = fwd.astype(lattice_ref.dtype)
        stay_part = fwd + stay_scr[k].astype(jnp.float32)
        shifted = pltpu.roll(fwd, 1, 1)
        # beyond the true time length the zero-padded lp selects 0
        # scores: stay 0 is the no-op convention, but move must be -inf
        # or padding blocks would logaddexp the shifted lattice in
        move_sc = jnp.where(base + k < T,
                            move_scr[k].astype(jnp.float32), _NEG)
        move_sc = pltpu.roll(move_sc, 1, 1)
        B, L = fwd.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        move_part = jnp.where(col == 0, _NEG, shifted + move_sc)
        new = jnp.logaddexp(stay_part, move_part)
        new = jnp.where(valid, new, _NEG)
        factor = jnp.max(new, axis=1, keepdims=True)
        fwd_carry[:] = jnp.where(valid, new - factor, _NEG)
        score_carry[:] = score_carry[:] + factor
        return 0

    run_steps(body, block_t, unroll)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        fwd_out[:] = fwd_carry[:]
        score_out[:] = score_carry[:]


def crf_forward_fused(lp, stay_idx, move_idx, modmove_idx, modmove_fact,
                      valid, block_b, block_t, interpret=False,
                      residual_dtype=None, precision=None,
                      emit_lattice=True, true_len=None, unroll=False):
    """Forward lattice pass with in-kernel score selection.

    Args:
        lp: [T, B, S] (sharpened) transition weights; T-padding zeros.
        stay_idx/move_idx: [B, L] int32 transition indices, position
            axis padded to the lane-padded lattice width L with an
            out-of-range value (>= S) so padded columns select nothing.
        modmove_idx/modmove_fact: [B, L] cat_mod weighted-column index /
            weight (fact all-zero for canonical models).
        valid: [B, L] int32 mask.
        emit_lattice: write the [T, B, L] renormalized-forward residual
            (gradient pass); the primal/validation path skips it.

    Returns: (fwd_final [B, L], score [B], lattice or None).
    """
    T, B, S = lp.shape
    L = stay_idx.shape[1]
    res_dt = residual_dtype or jnp.bfloat16
    assert T % block_t == 0
    nb = B // block_b
    kernel = functools.partial(_fwd_fused_kernel, block_t=block_t,
                               T=(T if true_len is None else true_len),
                               precision=precision,
                               emit_lattice=emit_lattice, unroll=unroll)
    imap = lambda ib, it: (it, ib, 0)
    smap2 = lambda ib, it: (ib, 0)
    idx_spec = pl.BlockSpec((block_b, L), smap2, memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((block_b, L), smap2, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, 1), smap2, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, L), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
    ]
    if emit_lattice:
        out_specs.append(pl.BlockSpec((block_t, block_b, L), imap,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, B, L), res_dt))
    out = pl.pallas_call(
        kernel,
        grid=(nb, T // block_t),
        in_specs=[
            pl.BlockSpec((block_t, block_b, S), imap,
                         memory_space=pltpu.VMEM),
            idx_spec, idx_spec, idx_spec, idx_spec, idx_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_b, L), jnp.float32),
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, S, L), jnp.bfloat16),
            pltpu.VMEM((block_b, S, L), jnp.bfloat16),
            pltpu.VMEM((block_t, block_b, L), jnp.bfloat16),
            pltpu.VMEM((block_t, block_b, L), jnp.bfloat16),
        ],
        interpret=interp(interpret),
    )(lp, stay_idx, move_idx, modmove_idx, modmove_fact, valid)
    if emit_lattice:
        fwd_final, score, lattice = out
        return fwd_final, score[:, 0], lattice
    fwd_final, score = out
    return fwd_final, score[:, 0], None


def _bwd_fused_kernel(lp_ref, stayidx_ref, moveidx_ref, modidx_ref,
                      modfact_ref, lattice_ref, valid_ref, last_ref,
                      grad_ref, bwd_carry, selstay_scr, selmove_scr,
                      stay_scr, move_scr, pstay_scr, pmove_scr,
                      *, block_t, T, ngrid, precision, unroll=False):
    B, L = bwd_carry.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        valid = valid_ref[:] > 0
        bwd_carry[:] = jnp.where((col == last_ref[:]) & valid, 0.0, _NEG)
        _build_selectors(stayidx_ref, moveidx_ref, modidx_ref,
                         modfact_ref, selstay_scr, selmove_scr)

    _fused_scores(lp_ref, selstay_scr, selmove_scr, stay_scr, move_scr,
                  precision)
    base = (ngrid - 1 - pl.program_id(1)) * block_t

    def body(j, _):
        k = block_t - 1 - j
        valid = valid_ref[:] > 0
        bwd_next = bwd_carry[:]
        stay_sc = stay_scr[k].astype(jnp.float32)
        move_sc = jnp.where(base + k < T,
                            move_scr[k].astype(jnp.float32), _NEG)
        fwd_curr = lattice_ref[k].astype(jnp.float32)

        stay_terms = jnp.where(valid, fwd_curr + bwd_next + stay_sc, _NEG)
        bwd_shift = pltpu.roll(bwd_next, L - 1, 1)
        move_valid = valid & (col < last_ref[:])
        move_terms = jnp.where(move_valid,
                               fwd_curr + bwd_shift + move_sc, _NEG)
        tmax = jnp.maximum(jnp.max(stay_terms, axis=1, keepdims=True),
                           jnp.max(move_terms, axis=1, keepdims=True))
        ex_stay = jnp.where(stay_terms > _NEG / 2,
                            jnp.exp(stay_terms - tmax), 0.0)
        ex_move = jnp.where(move_terms > _NEG / 2,
                            jnp.exp(move_terms - tmax), 0.0)
        denom = (jnp.sum(ex_stay, axis=1, keepdims=True)
                 + jnp.sum(ex_move, axis=1, keepdims=True))
        denom = jnp.where(denom > 0, denom, 1.0)   # see _bwd_kernel note
        pstay_scr[k] = (ex_stay / denom).astype(pstay_scr.dtype)
        pmove_scr[k] = (ex_move / denom).astype(pmove_scr.dtype)

        stay_part = stay_sc + bwd_next
        move_part = jnp.where(move_valid, move_sc + bwd_shift, _NEG)
        new = jnp.logaddexp(stay_part, move_part)
        new = jnp.where(valid, new, _NEG)
        factor = jnp.max(new, axis=1, keepdims=True)
        bwd_carry[:] = jnp.where(valid, new - factor, _NEG)
        return 0

    run_steps(body, block_t, unroll)

    # Scatter the block's posteriors straight into the transition-weight
    # gradient with the SAME resident selectors, transposed contraction
    # (over L): the [T,B,L] posterior streams never exist in HBM.  bf16
    # posterior scratch matches the unfused path's bf16 posterior
    # streams (out_dtype in crf_backward_posteriors).
    dnT = (((2,), (2,)), ((0,), (0,)))
    ps = jnp.transpose(pstay_scr[:], (1, 0, 2))        # [bb, bt, L]
    pm = jnp.transpose(pmove_scr[:], (1, 0, 2))
    g = (jax.lax.dot_general(ps, selstay_scr[:], dnT,
                             preferred_element_type=jnp.float32,
                             precision=precision)
         + jax.lax.dot_general(pm, selmove_scr[:], dnT,
                               preferred_element_type=jnp.float32,
                               precision=precision))
    grad_ref[:] = jnp.transpose(g, (1, 0, 2)).astype(grad_ref.dtype)


def crf_backward_fused(lp, stay_idx, move_idx, modmove_idx, modmove_fact,
                       lattice, valid, last, block_b, block_t,
                       interpret=False, precision=None, true_len=None,
                       unroll=False):
    """Backward pass emitting d(score)/d(lp) DIRECTLY ([T, B, S]): score
    selection on the way in and the posterior scatter on the way out
    both ride the scratch-resident per-row selectors."""
    T, B, S = lp.shape
    L = stay_idx.shape[1]
    assert T % block_t == 0
    ngrid = T // block_t
    nb = B // block_b
    kernel = functools.partial(_bwd_fused_kernel, block_t=block_t,
                               T=(T if true_len is None else true_len),
                               ngrid=ngrid, precision=precision,
                               unroll=unroll)

    def rev(ib, it):
        return (ngrid - 1 - it, ib, 0)

    smap2 = lambda ib, it: (ib, 0)
    idx_spec = pl.BlockSpec((block_b, L), smap2, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, block_b, S), rev,
                         memory_space=pltpu.VMEM),
            idx_spec, idx_spec, idx_spec, idx_spec,
            pl.BlockSpec((block_t, block_b, L), rev,
                         memory_space=pltpu.VMEM),
            idx_spec,
            pl.BlockSpec((block_b, 1), smap2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, block_b, S), rev,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, L), jnp.float32),
            pltpu.VMEM((block_b, S, L), jnp.bfloat16),
            pltpu.VMEM((block_b, S, L), jnp.bfloat16),
            pltpu.VMEM((block_t, block_b, L), jnp.bfloat16),
            pltpu.VMEM((block_t, block_b, L), jnp.bfloat16),
            pltpu.VMEM((block_t, block_b, L), jnp.bfloat16),
            pltpu.VMEM((block_t, block_b, L), jnp.bfloat16),
        ],
        interpret=interp(interpret),
    )(lp, stay_idx, move_idx, modmove_idx, modmove_fact, lattice, valid,
      last)[0]
