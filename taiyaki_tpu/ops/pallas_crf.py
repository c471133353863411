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

from taiyaki_tpu.ops.pallas_common import run_steps

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
        interpret=interpret,
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
        interpret=interpret,
    )(stay_all, move_all, lattice, valid, last)
