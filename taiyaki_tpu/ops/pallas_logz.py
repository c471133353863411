"""Pallas TPU kernels for the flip-flop log partition function.

On-device equivalents of the cupy LogZ forward/backward kernels
(reference: taiyaki/cupy_extensions/flipflop.py:338-354, where
d(logZ)/d(scores) = posterior transition probabilities).  The 2*nbase
state recursion is phrased entirely as matmuls against fixed 0/1
source/destination selector matrices so the per-step work runs on the
MXU/VPU without gathers:

    cand   = fwd @ SRC + scores            (value entering each transition)
    new[d] = logsumexp over {j : dest(j)=d} cand[j]   (exp @ DST^T)

The caller pads the 40 (=2L(L+1)) transition columns to 128 lanes with
-inf and T to a block_t multiple with identity (stay-only) blocks, which
contribute exactly 0 to logZ under the per-block logsumexp
renormalization used here (matching ops/flipflop.flipflop_logz).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taiyaki_tpu.ops.pallas_common import interp, run_steps

_NEG = -1e30
LANES = 128
DEFAULT_BLOCK_T = 32


# Batch tile (outer grid dim; per-tile carries in scratch — see
# pallas_crf.py).  VMEM per grid step is bounded by the tuned B=64
# budget regardless of total batch.
BLOCK_B = 256


def block_b_for(batch_size):
    """Largest of {256, 128, ..., 8} dividing the batch; whole batch if
    none divides (any batch compiles — no reshape constraint)."""
    bb = BLOCK_B
    while bb > 8 and batch_size % bb != 0:
        bb //= 2
    if batch_size % bb != 0:
        return batch_size
    return min(bb, batch_size)


def block_t_for(batch_size):
    """Scale block_t down (power of two) so VMEM streams stay within the
    B=64 budget DEFAULT_BLOCK_T was tuned for (streams ~ block_t times
    the batch TILE)."""
    bb = block_b_for(batch_size)
    bt = DEFAULT_BLOCK_T
    while bt > 1 and bt * bb > 64 * DEFAULT_BLOCK_T:
        bt //= 2
    return bt


def selectors(nbase):
    """(SRC [2nb, ntrans], DST [2nb, ntrans], stay_cols) as numpy 0/1.

    Column j encodes from + 2*nbase*min(to, nbase)
    (taiyaki_tpu/flipflopfings.py move_indices): j < 2nb*nb are moves
    into flip base j // 2nb from source j % 2nb; the final 2nb columns
    are flip->flop (same base) then flop stays.
    """
    nff = 2 * nbase
    ntrans = nff * (nbase + 1)
    src = np.zeros((nff, ntrans), dtype=np.float32)
    dst = np.zeros((nff, ntrans), dtype=np.float32)
    for j in range(nff * nbase):
        src[j % nff, j] = 1.0
        dst[j // nff, j] = 1.0
    for b in range(nbase):
        src[b, nff * nbase + b] = 1.0          # flip b -> flop b
        dst[nbase + b, nff * nbase + b] = 1.0
        src[nbase + b, nff * nbase + nbase + b] = 1.0   # flop b stay
        dst[nbase + b, nff * nbase + nbase + b] = 1.0
    stay_cols = [s + nff * s for s in range(nbase)] + \
        [nff * nbase + nbase + b for b in range(nbase)]
    return src, dst, np.array(stay_cols, dtype=np.int64)


def _pad_lanes(m):
    """Pad a [rows, cols] selector to [LANES, LANES] with zeros."""
    out = np.zeros((LANES, LANES), dtype=np.float32)
    out[:m.shape[0], :m.shape[1]] = m
    return out


def _row_logsumexp(x):
    m = jnp.max(x, axis=1, keepdims=True)
    return jnp.log(jnp.sum(jnp.where(x > _NEG / 2, jnp.exp(x - m), 0.0),
                           axis=1, keepdims=True)) + m


def _fwd_kernel(scores_ref, src_ref, dst_ref, fwd_out, logz_out,
                *rest, block_t, nff, unroll=False, emit=True):
    if emit:
        lattice_ref, fwd_carry, logz_carry = rest
    else:
        fwd_carry, logz_carry = rest
    B = fwd_carry.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        # flip states uniform, flop states empty, renormalized to lse=0
        init = jnp.where(col < nff // 2, -jnp.log(float(nff // 2)), _NEG)
        fwd_carry[:] = init
        logz_carry[:] = jnp.zeros_like(logz_carry)

    def body(k, _):
        fwd = fwd_carry[:]
        if emit:
            lattice_ref[k] = fwd.astype(lattice_ref.dtype)
        cand = (jnp.dot(fwd, src_ref[:], preferred_element_type=jnp.float32)
                + scores_ref[k].astype(jnp.float32))
        cand = jnp.where(col < nff * (nff // 2 + 1), cand, _NEG)
        mx = jnp.max(cand, axis=1, keepdims=True)
        ex = jnp.where(cand > _NEG / 2, jnp.exp(cand - mx), 0.0)
        summed = jnp.dot(ex, dst_ref[:].T,
                         preferred_element_type=jnp.float32)
        new = jnp.where((summed > 0.0) & (col < nff),
                        jnp.log(jnp.maximum(summed, 1e-30)) + mx, _NEG)
        factor = _row_logsumexp(new)
        fwd_carry[:] = jnp.where(col < nff, new - factor, _NEG)
        logz_carry[:] = logz_carry[:] + factor
        return 0

    run_steps(body, block_t, unroll)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        fwd_out[:] = fwd_carry[:]
        logz_out[:] = logz_carry[:]


def logz_forward(scores_p, nbase, block_t=DEFAULT_BLOCK_T, interpret=False,
                 residual_dtype=None, unroll=False, emit_lattice=True):
    """Forward pass.

    Args:
        scores_p: [T, B, LANES] scores padded with -inf beyond ntrans and
            with identity blocks beyond the true T (any float dtype;
            arithmetic is f32).
        nbase: number of canonical bases.
        residual_dtype: storage dtype for the lattice (a gradient-only
            residual; logz/fwd_final stay float32).
        emit_lattice: False skips the [T, B, LANES] residual stream
            entirely — for primal-only calls (inference make_trans,
            validation eval) where no backward will run.

    Returns:
        (fwd_final [B, LANES], logz [B], lattice [T, B, LANES] or None).
    """
    T, B, L = scores_p.shape
    res_dt = residual_dtype or jnp.float32
    assert L == LANES and T % block_t == 0
    src, dst, _ = selectors(nbase)
    bb = block_b_for(B)
    nb = B // bb
    kernel = functools.partial(_fwd_kernel, block_t=block_t, nff=2 * nbase,
                               unroll=unroll, emit=emit_lattice)
    out_specs = [
        pl.BlockSpec((bb, LANES), lambda ib, it: (ib, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, 1), lambda ib, it: (ib, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, LANES), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
    ]
    if emit_lattice:
        out_specs.append(
            pl.BlockSpec((block_t, bb, LANES), lambda ib, it: (it, ib, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, B, LANES), res_dt))
    outs = pl.pallas_call(
        kernel,
        grid=(nb, T // block_t),
        in_specs=[
            pl.BlockSpec((block_t, bb, LANES), lambda ib, it: (it, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb, LANES), jnp.float32),
            pltpu.VMEM((bb, 1), jnp.float32),
        ],
        interpret=interp(interpret),
    )(scores_p, jnp.asarray(_pad_lanes(src)), jnp.asarray(_pad_lanes(dst)))
    fwd_final, logz = outs[0], outs[1]
    lattice = outs[2] if emit_lattice else None
    return fwd_final, logz[:, 0], lattice


def _bwd_kernel(scores_ref, lattice_ref, src_ref, dst_ref, post_ref,
                bwd_carry, *, block_t, nff, unroll=False):
    B = bwd_carry.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
    ntr = nff * (nff // 2 + 1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        bwd_carry[:] = jnp.where(col < nff, -jnp.log(float(nff)), _NEG)

    def body(j, _):
        k = block_t - 1 - j
        bwd_next = bwd_carry[:]
        scores_t = scores_ref[k].astype(jnp.float32)
        fwd = lattice_ref[k].astype(jnp.float32)
        bwd_d = jnp.dot(bwd_next, dst_ref[:],
                        preferred_element_type=jnp.float32)
        terms = (jnp.dot(fwd, src_ref[:], preferred_element_type=jnp.float32)
                 + scores_t + jnp.where(col < ntr, bwd_d, _NEG))
        mx = jnp.max(terms, axis=1, keepdims=True)
        ex = jnp.where(terms > _NEG / 2, jnp.exp(terms - mx), 0.0)
        # where-guard, not maximum(.., 1e-38): 1e-38 flushes to zero in
        # f32 FTZ and would make this 0/0 = NaN for no-path rows
        den = jnp.sum(ex, axis=1, keepdims=True)
        post_ref[k] = (ex / jnp.where(den > 0, den, 1.0)
                       ).astype(post_ref.dtype)

        terms2 = scores_t + bwd_d
        terms2 = jnp.where(col < ntr, terms2, _NEG)
        mx2 = jnp.max(terms2, axis=1, keepdims=True)
        ex2 = jnp.where(terms2 > _NEG / 2, jnp.exp(terms2 - mx2), 0.0)
        summed = jnp.dot(ex2, src_ref[:].T,
                         preferred_element_type=jnp.float32)
        new = jnp.where((summed > 0.0) & (col < nff),
                        jnp.log(jnp.maximum(summed, 1e-30)) + mx2, _NEG)
        factor = jnp.max(new, axis=1, keepdims=True)
        bwd_carry[:] = jnp.where(col < nff, new - factor, _NEG)
        return 0

    run_steps(body, block_t, unroll)


def logz_backward_posteriors(scores_p, lattice, nbase,
                             block_t=DEFAULT_BLOCK_T, interpret=False,
                             out_dtype=None, unroll=False):
    """Backward pass: per-block posterior over the ntrans transitions
    (= d(logZ)/d(scores), rows beyond the true T are garbage and must be
    sliced off by the caller)."""
    T, B, L = scores_p.shape
    o_dt = out_dtype or jnp.float32
    assert L == LANES and T % block_t == 0
    ngrid = T // block_t
    src, dst, _ = selectors(nbase)
    bb = block_b_for(B)
    nb = B // bb
    kernel = functools.partial(_bwd_kernel, block_t=block_t, nff=2 * nbase,
                               unroll=unroll)

    def rev(ib, it):
        return (ngrid - 1 - it, ib, 0)

    return pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, bb, LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, bb, LANES), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, LANES), o_dt),
        ],
        scratch_shapes=[pltpu.VMEM((bb, LANES), jnp.float32)],
        interpret=interp(interpret),
    )(scores_p, lattice, jnp.asarray(_pad_lanes(src)),
      jnp.asarray(_pad_lanes(dst)))[0]
