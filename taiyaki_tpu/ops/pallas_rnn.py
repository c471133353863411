"""Pallas TPU kernels for the LSTM/GRU time scans.

The custom-VJP scans in ops/rnn.py are already matmul-lean, but XLA's
`lax.scan` pays ~5us of loop machinery per iteration — at 4000 sequential
steps that is most of the forward pass.  These kernels run the whole time
loop *inside* one Pallas program: the recurrent weights and the hidden
carry live in VMEM across the (sequential) TPU grid, each grid step
streams a block of `block_t` time steps of the input gates HBM->VMEM and
writes the states back.

Layout notes:
* weights are passed pre-transposed ([H, kH]) so the in-loop product is a
  plain [B,H] x [H,kH] `jnp.dot` with no per-step transpose;
* the carry persists in VMEM scratch between grid steps (TPU grids are
  sequential), zero-initialized at program_id 0;
* the backward kernel walks the grid in reverse via its index_map and
  emits per-step gate gradients; the weight gradient is one big GEMM
  outside the kernel (as in ops/rnn.py).

Used automatically by ops/rnn.py on TPU; interpret mode keeps the same
code testable on CPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taiyaki_tpu.ops.pallas_common import interp, run_steps

# Time steps per grid iteration.  Bounded by VMEM: with double-buffered
# streaming the in/out blocks cost ~2 * block_t * block_b * (9H) floats;
# at block_b=64, H=256 block_t=8 keeps the total under the VMEM budget.
DEFAULT_BLOCK_T = 8

# Batch rows per grid iteration.  The batch axis is tiled across an OUTER
# grid dimension (each tile runs the whole time scan with its own carry
# scratch; TPU grids are sequential so the carry is never clobbered), so
# VMEM per grid step is constant in the total batch size — bs512+ runs
# where the untiled kernels exceeded VMEM even at block_t=1, and block_t
# no longer degrades as the batch grows.  Per-batch-row math is
# independent, so tiling cannot change results.
DEFAULT_BLOCK_B = 256

# block_t * block_b budget, from the tuned B=64/block_t=8 VMEM point.
_BT_BUDGET = 64 * DEFAULT_BLOCK_T


def block_b_for(batch_size):
    """Largest of {256, 128, ..., 8} dividing the batch (callers
    guarantee batch % 8 == 0 — ops/rnn.py:_use_pallas).

    256 is the measured sweet spot: for B <= 256 the tile is the whole
    batch and block_t_for reproduces the pre-tiling tuning exactly
    (bs256 measured 5304 chunks/s untiled vs 5172 with 64-row tiles —
    more, smaller recurrent matmuls); beyond 256 the batch splits into
    256-row tiles, which is what makes bs512+ fit VMEM at all.
    TAIYAKI_TPU_RNN_BLOCK_B overrides for on-chip tuning probes."""
    import os
    override = os.environ.get("TAIYAKI_TPU_RNN_BLOCK_B")
    if override and batch_size % int(override) == 0:
        return int(override)
    bb = DEFAULT_BLOCK_B
    while bb > 8 and batch_size % bb != 0:
        bb //= 2
    return min(bb, batch_size)


def block_t_for(batch_size):
    """Time steps per grid iteration for this batch size: scales down as
    the batch TILE grows so VMEM per grid step stays at the tuned
    block_t * block_b budget.  TAIYAKI_TPU_RNN_BLOCK_T overrides for
    on-chip tuning probes (misc/ab_train_variants.py)."""
    import os
    override = os.environ.get("TAIYAKI_TPU_RNN_BLOCK_T")
    if override:
        return int(override)
    bb = block_b_for(batch_size)
    return max(1, min(DEFAULT_BLOCK_T, _BT_BUDGET // bb))


def _time_maps(ngrid, block_t, descending):
    """(index_map, in-block step order) for a time traversal direction.

    Index maps take (ib, it) grid coordinates: batch-tile OUTER, time
    INNER, so each batch tile scans all of time before the next tile
    starts (the carry resets at it == 0).

    `descending=True` walks the time grid from the last block to the
    first and each block from its last row to its first — used by the
    backward kernels of natural layers AND the forward kernels of
    `Reverse`d layers (reference flips the data instead,
    taiyaki/layers.py:117-154; walking the grid backwards skips those HBM
    round trips entirely).
    """
    if descending:
        return (lambda ib, it: (ngrid - 1 - it, ib, 0),
                lambda j: block_t - 1 - j)
    return (lambda ib, it: (it, ib, 0), lambda j: j)


# Index map for weight-like inputs that every grid step reads whole.
_WMAP = lambda ib, it: (0, 0)

# Time dimension's position in the grid (batch tile is dim 0).
_TIME_DIM = 1


def _lstm_fwd_kernel(gx_ref, swt_ref, h_ref, c_ref, pre_ref,
                     h_carry, c_carry, *, block_t, H, order, precision,
                     unroll=False):
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)
        c_carry[:] = jnp.zeros_like(c_carry)

    def body(j, _):
        k = order(j)
        h = h_carry[:]
        c = c_carry[:]
        pre = gx_ref[k] + jnp.dot(h, swt_ref[:], precision=precision,
                                  preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(pre[:, :H])
        f = jax.nn.sigmoid(pre[:, H:2 * H])
        g = jnp.tanh(pre[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(pre[:, 3 * H:])
        c2 = f * c + i * g
        h2 = o * jnp.tanh(c2)
        h_ref[k] = h2.astype(h_ref.dtype)
        c_ref[k] = c2.astype(c_ref.dtype)
        pre_ref[k] = pre.astype(pre_ref.dtype)
        h_carry[:] = h2
        c_carry[:] = c2
        return 0

    run_steps(body, block_t, unroll)


def lstm_fwd(gates_x, sW, block_t=DEFAULT_BLOCK_T, interpret=False,
             residual_dtype=None, reverse=False, h_dtype=None,
             precision=None, unroll=False):
    """Fused LSTM forward.

    Args:
        gates_x: [T, B, 4H] input gates (torch order i,f,g,o); T must be a
            multiple of block_t (callers pad).
        sW: [4H, H] recurrent weights.
        residual_dtype: storage dtype for the backward-pass residuals
            (c, pre); bfloat16 halves their HBM stream traffic while all
            arithmetic stays float32.
        h_dtype: storage dtype of the h output stream (default f32; the
            recurrent carry is always f32 in VMEM regardless).
        reverse: run the recurrence backwards in time (for `Reverse`d
            layers) by walking the grid in descending order — outputs stay
            in natural time positions, no data flips needed.

    Returns:
        (h [T,B,H], c [T,B,H], pre [T,B,4H]) — c/pre in residual_dtype.
    """
    T, B, H4 = gates_x.shape
    res_dt = residual_dtype or gates_x.dtype
    H = H4 // 4
    assert T % block_t == 0, (T, block_t)
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    imap, order = _time_maps(ngrid, block_t, descending=reverse)
    swt = sW.T  # [H, 4H]
    kernel = functools.partial(_lstm_fwd_kernel, block_t=block_t, H=H,
                               order=order, precision=precision,
                               unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, bb, H4), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), _WMAP,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H4), imap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), h_dtype or jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), res_dt),
            jax.ShapeDtypeStruct((T, B, H4), res_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
        ],
        interpret=interp(interpret),
    )(gates_x, swt)


def _emit_dx(g_ref, iwt_ref, dx_ref):
    """Per-block d_x GEMM: read back the gate-gradient block just written
    to VMEM and contract it with iW — one [block_t*B, kH] x [kH, D]
    matmul per grid step, so the XLA-side d_x einsum (and its full HBM
    re-read of the gradient stream) disappears.  The gradient operand is
    the *stored* (possibly bf16) block, matching what the outside einsum
    would have read."""
    bt, B, kH = g_ref.shape
    g = g_ref[:].reshape(bt * B, kH)
    dx = jnp.dot(g, iwt_ref[:], preferred_element_type=jnp.float32)
    dx_ref[:] = dx.reshape(bt, B, dx.shape[-1]).astype(dx_ref.dtype)


# TIMING PROBE ONLY (TAIYAKI_TPU_FAKE_TRANS=1): replace the backward's
# transcendentals with linear stand-ins to measure their share of the
# step.  Wrong numerics; never a shipped path.
import os as _os


def _fake_trans():
    return _os.environ.get("TAIYAKI_TPU_FAKE_TRANS") == "1"


def _sig(x):
    return x * 0.25 + 0.5 if _fake_trans() else jax.nn.sigmoid(x)


def _tanh(x):
    return x * 0.5 if _fake_trans() else jnp.tanh(x)


def _lstm_cell_bwd(dh_ref, pre_ref, c_ref, cprev_ref, dh_carry, dc_carry,
                   k, H):
    """One LSTM step's gate gradients (shared by the bwd kernel
    variants).  Returns (dpre [B, 4H] f32, dc [B, H] f32)."""
    pre = pre_ref[k].astype(jnp.float32)
    i = _sig(pre[:, :H])
    f = _sig(pre[:, H:2 * H])
    g = _tanh(pre[:, 2 * H:3 * H])
    o = _sig(pre[:, 3 * H:])
    tc = _tanh(c_ref[k].astype(jnp.float32))
    dh = dh_ref[k] + dh_carry[:]
    do = dh * tc
    dc = dh * o * (1.0 - tc * tc) + dc_carry[:]
    di = dc * g
    df = dc * cprev_ref[k].astype(jnp.float32)
    dg = dc * i
    dpre = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f),
         dg * (1.0 - g * g), do * o * (1.0 - o)], axis=1)
    return dpre, dc * f


# contract the batch axis of two [B, *] blocks -> [*, *] weight-grad tile
_BATCH_CONTRACT = (((0,), (0,)), ((), ()))


def _lstm_bwd_fusedw_kernel(dh_ref, pre_ref, c_ref, cprev_ref, h_ref, x_ref,
                            sw_ref, iwt_ref,
                            dx_ref, dsw_ref, diw_ref, db_ref,
                            dh_carry, dc_carry, g_hold,
                            *, block_t, H, T, ngrid, descending, order,
                            unroll=False):
    """Backward with the weight gradients accumulated IN-KERNEL.

    The gate-gradient stream never touches HBM: d_x is emitted per step,
    and d_sW / d_iW / d_b accumulate into per-batch-tile output blocks
    (f32) that stay VMEM-resident across the tile's whole time walk —
    removing the dpre stream write plus the two big einsum re-reads
    (measured ~3.1 ms/layer at bs256, ~30% of the train step across 5
    layers).

    d_sW pairing trick: d_sW = sum_t dpre[t] (x) h_prev[t], and
    h_prev[t] is exactly the h of the NEXT step this (time-opposite)
    walk visits — so each step contracts the HELD gate gradient of the
    previously-visited step with its own h, and the held block rolls
    forward.  The boundary terms vanish (initial hold is zero; the last
    step's dpre pairs with the zero initial state).  Works unchanged in
    both directions.
    """
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        dh_carry[:] = jnp.zeros_like(dh_carry)
        dc_carry[:] = jnp.zeros_like(dc_carry)
        g_hold[:] = jnp.zeros_like(g_hold)
        dsw_ref[:] = jnp.zeros_like(dsw_ref)
        diw_ref[:] = jnp.zeros_like(diw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    base = _block_base(ngrid, block_t, descending)

    def body(j, _):
        k = order(j)
        dpre, dc_next = _lstm_cell_bwd(dh_ref, pre_ref, c_ref, cprev_ref,
                                       dh_carry, dc_carry, k, H)
        # zero-padded tail rows must not leak into d_b (reverse layers
        # walk the gradient chain INTO the padding: the carry makes
        # dpre nonzero there even though every input row is zero)
        dpre = jnp.where(base + k < T, dpre, 0.0)
        dx = jnp.dot(dpre, iwt_ref[:], preferred_element_type=jnp.float32)
        dx_ref[k] = dx.astype(dx_ref.dtype)
        dsw_ref[0] += jax.lax.dot_general(
            g_hold[:], h_ref[k].astype(jnp.float32), _BATCH_CONTRACT,
            preferred_element_type=jnp.float32)
        diw_ref[0] += jax.lax.dot_general(
            dpre, x_ref[k].astype(jnp.float32), _BATCH_CONTRACT,
            preferred_element_type=jnp.float32)
        db_ref[0] += jnp.sum(dpre, axis=0, keepdims=True)
        g_hold[:] = dpre
        dh_carry[:] = jnp.dot(dpre, sw_ref[:],
                              preferred_element_type=jnp.float32)
        dc_carry[:] = dc_next
        return 0

    run_steps(body, block_t, unroll)


def _lstm_cell_bwd_acts(dh_ref, acts_ref, tc_ref, cprev_ref,
                        dh_carry, dc_carry, k, H):
    """One LSTM step's gate gradients from STORED post-activation gates
    and tanh(c) — zero transcendentals (vs five in _lstm_cell_bwd; a
    timing probe bounded their cost at 3.9% of the train step).
    Returns (dpre [B, 4H] f32, dc [B, H] f32)."""
    acts = acts_ref[k].astype(jnp.float32)
    i = acts[:, :H]
    f = acts[:, H:2 * H]
    g = acts[:, 2 * H:3 * H]
    o = acts[:, 3 * H:]
    tc = tc_ref[k].astype(jnp.float32)
    dh = dh_ref[k] + dh_carry[:]
    do = dh * tc
    dc = dh * o * (1.0 - tc * tc) + dc_carry[:]
    di = dc * g
    df = dc * cprev_ref[k].astype(jnp.float32)
    dg = dc * i
    dpre = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f),
         dg * (1.0 - g * g), do * o * (1.0 - o)], axis=1)
    return dpre, dc * f


def _lstm_bwd_acts_kernel(dh_ref, acts_ref, tc_ref, cprev_ref, h_ref,
                          x_ref, sw_ref, iwt_ref,
                          dx_ref, dsw_ref, diw_ref, db_ref,
                          dh_carry, dc_carry, g_hold,
                          *, block_t, H, T, ngrid, descending, order,
                          unroll=False):
    """_lstm_bwd_fusedw_kernel with the stored-activation cell backward:
    identical structure (held-gate-gradient d_sW pairing, per-step
    weight-grad accumulation), no transcendentals in the loop."""
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        dh_carry[:] = jnp.zeros_like(dh_carry)
        dc_carry[:] = jnp.zeros_like(dc_carry)
        g_hold[:] = jnp.zeros_like(g_hold)
        dsw_ref[:] = jnp.zeros_like(dsw_ref)
        diw_ref[:] = jnp.zeros_like(diw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    base = _block_base(ngrid, block_t, descending)

    def body(j, _):
        k = order(j)
        dpre, dc_next = _lstm_cell_bwd_acts(dh_ref, acts_ref, tc_ref,
                                            cprev_ref, dh_carry, dc_carry,
                                            k, H)
        dpre = jnp.where(base + k < T, dpre, 0.0)
        dx = jnp.dot(dpre, iwt_ref[:], preferred_element_type=jnp.float32)
        dx_ref[k] = dx.astype(dx_ref.dtype)
        dsw_ref[0] += jax.lax.dot_general(
            g_hold[:], h_ref[k].astype(jnp.float32), _BATCH_CONTRACT,
            preferred_element_type=jnp.float32)
        diw_ref[0] += jax.lax.dot_general(
            dpre, x_ref[k].astype(jnp.float32), _BATCH_CONTRACT,
            preferred_element_type=jnp.float32)
        db_ref[0] += jnp.sum(dpre, axis=0, keepdims=True)
        g_hold[:] = dpre
        dh_carry[:] = jnp.dot(dpre, sw_ref[:],
                              preferred_element_type=jnp.float32)
        dc_carry[:] = dc_next
        return 0

    run_steps(body, block_t, unroll)


def lstm_bwd_acts(dh_out, acts, tc, c_prev, h, x, sW, iW,
                  block_t=DEFAULT_BLOCK_T, interpret=False, reverse=False,
                  dx_dtype=None, true_len=None, unroll=False):
    """Fused LSTM backward from stored activations (acts = [i|f|g|o]
    post-nonlinearity, tc = tanh(c)) — same outputs/partials contract
    as lstm_bwd_fusedw."""
    T, B, H = dh_out.shape
    H4 = 4 * H
    D = iW.shape[1]
    assert T % block_t == 0
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    descending = not reverse
    imap, order = _time_maps(ngrid, block_t, descending=descending)
    wmap3 = lambda ib, it: (ib, 0, 0)
    stream = lambda w: pl.BlockSpec((block_t, bb, w), imap,
                                    memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _lstm_bwd_acts_kernel, block_t=block_t, H=H,
        T=(T if true_len is None else true_len), ngrid=ngrid,
        descending=descending, order=order, unroll=unroll)
    dx, dsw, diw, db = pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            stream(H), stream(H4), stream(H), stream(H), stream(H),
            stream(D),
            pl.BlockSpec((H4, H), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, D), _WMAP, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, H), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, D), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H4), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), dx_dtype or jnp.float32),
            jax.ShapeDtypeStruct((nb, H4, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H4, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H4), jnp.float32),
        ],
        interpret=interp(interpret),
    )(dh_out, acts, tc, c_prev, h, x, sW, iW)
    return dx, dsw, diw, db[:, 0]


def _shifted_prev_block(ref, prevblk_ref, base, T, descending):
    """The whole block of prev-states, vectorized over in-block rows:
    row k holds the state ENTERING that row's step (see _prev_at) —
    static slicing + one boundary row from the adjacent block, with the
    initial-state rows zeroed."""
    blk = ref[:].astype(jnp.float32)
    bt = blk.shape[0]
    row_t = base + jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
    if descending:
        boundary = prevblk_ref[bt - 1:bt].astype(jnp.float32)
        shifted = jnp.concatenate([boundary, blk[:bt - 1]], axis=0)
        return jnp.where(row_t == 0, 0.0, shifted)
    boundary = prevblk_ref[0:1].astype(jnp.float32)
    shifted = jnp.concatenate([blk[1:], boundary], axis=0)
    return jnp.where(row_t + 1 >= T, 0.0, shifted)


def lstm_bwd_fusedw(dh_out, pre, c, c_prev, h, x, sW, iW,
                    block_t=DEFAULT_BLOCK_T, interpret=False, reverse=False,
                    dx_dtype=None, true_len=None, unroll=False):
    """Fused LSTM backward emitting (d_x, d_sW, d_iW, d_b) directly.

    All [T, B, *] streams must share T (padded to block_t).  Weight
    gradients come back as per-batch-tile partials ([nb, 4H, H] /
    [nb, 4H, D] / [nb, 4H]) for the caller to sum — per-tile
    accumulation happens in VMEM across the tile's time walk.
    """
    T, B, H = dh_out.shape
    H4 = 4 * H
    D = iW.shape[1]
    assert T % block_t == 0
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    descending = not reverse
    imap, order = _time_maps(ngrid, block_t, descending=descending)
    wmap3 = lambda ib, it: (ib, 0, 0)
    # Weight gradients accumulate PER STEP: a block-batched variant
    # (park dpre in scratch, one large dot per block) measured NEUTRAL
    # on-chip (7283 vs 7326 at bs256 — the per-step dots already hide
    # under the sequential chain) while costing a second h stream for
    # the d_sW pairing; reverted, misc/ab_train_variants.py stepwgrad.
    stream = lambda w: pl.BlockSpec((block_t, bb, w), imap,
                                    memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _lstm_bwd_fusedw_kernel, block_t=block_t, H=H,
        T=(T if true_len is None else true_len), ngrid=ngrid,
        descending=descending, order=order, unroll=unroll)
    in_specs = [
        stream(H), stream(H4), stream(H), stream(H), stream(H),
        stream(D),
        pl.BlockSpec((H4, H), _WMAP, memory_space=pltpu.VMEM),
        pl.BlockSpec((H4, D), _WMAP, memory_space=pltpu.VMEM),
    ]
    inputs = (dh_out, pre, c, c_prev, h, x, sW, iW)
    scratch = [
        pltpu.VMEM((bb, H), jnp.float32),
        pltpu.VMEM((bb, H), jnp.float32),
        pltpu.VMEM((bb, H4), jnp.float32),
    ]
    dx, dsw, diw, db = pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, H), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, D), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H4), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), dx_dtype or jnp.float32),
            jax.ShapeDtypeStruct((nb, H4, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H4, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, H4), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interp(interpret),
    )(*inputs)
    return dx, dsw, diw, db[:, 0]


def _prev_at(ref, prevblk_ref, k, base, block_t, T, descending):
    """State ENTERING step t: row t-1 (natural) / t+1 (reverse) of the
    stream, crossing into the adjacent time block at the block boundary.

    Natural t == 0 enters from the zero initial state (masked); for
    reverse layers t == T-1 does (also masked — padding supplies zeros
    only when T doesn't divide block_t).  `k` may be traced (rolled
    fori_loop): load the clamped in-block row and the boundary row,
    select with where."""
    if descending:
        inblock = ref[jnp.maximum(k - 1, 0)].astype(jnp.float32)
        boundary = prevblk_ref[block_t - 1].astype(jnp.float32)
        prev = jnp.where(k > 0, inblock, boundary)
        return jnp.where(base + k == 0, 0.0, prev)
    inblock = ref[jnp.minimum(k + 1, block_t - 1)].astype(jnp.float32)
    boundary = prevblk_ref[0].astype(jnp.float32)
    val = jnp.where(k + 1 < block_t, inblock, boundary)
    return jnp.where(base + k + 1 >= T, 0.0, val)


def _prevblk_map(ngrid, descending):
    """Index map for the second (block-shifted) stream of a state array:
    the adjacent time block holding the boundary prev-state row.  Grid
    indices are traced: jnp clamps, not python max/min."""
    if descending:
        return lambda ib, it: (jnp.maximum(ngrid - 1 - it - 1, 0), ib, 0)
    return lambda ib, it: (jnp.minimum(it + 1, ngrid - 1), ib, 0)


def _lstm_bwd_recompute_kernel(dh_ref, c_ref, cprevblk_ref,
                               h_ref, hprevblk_ref,
                               x_ref, swt_ref, sw_ref, iwt_ref, iw_ref, b_ref,
                               dx_ref, dsw_ref, diw_ref, db_ref,
                               dh_carry, dc_carry, gx_scratch,
                               *, block_t, H, T, ngrid, descending, order,
                               precision, unroll=False):
    """Fused-weights backward that RECOMPUTES pre instead of reading a
    stored residual: pre[t] = (x@iW + b)[t] + h[t-1]@sW.

    The gate GEMM is one per-block matmul (same shape as the fused
    forward's) and h[t-1] comes from the h stream itself — in-block row
    k-1, or the boundary row of the adjacent time block streamed via a
    second BlockSpec on the same array.  This removes the [T, B, 4H]
    pre residual from BOTH directions (the forward's largest write and
    this kernel's largest read), and hands d_sW its h_prev operand
    directly (no held-block pairing needed).

    For natural layers h_prev at t == 0 is the zero initial state
    (masked explicitly); for Reverse'd layers h_prev[t] = h[t+1], and
    the zero-padded tail rows supply the zero boundary for free.
    """
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        dh_carry[:] = jnp.zeros_like(dh_carry)
        dc_carry[:] = jnp.zeros_like(dc_carry)
        dsw_ref[:] = jnp.zeros_like(dsw_ref)
        diw_ref[:] = jnp.zeros_like(diw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    _fused_gates(x_ref, iwt_ref, b_ref, gx_scratch, block_t, precision)
    base = _block_base(ngrid, block_t, descending)

    def prev_at(ref, prevblk_ref, k):
        return _prev_at(ref, prevblk_ref, k, base, block_t, T, descending)

    def body(j, _):
        k = order(j)
        h_prev = prev_at(h_ref, hprevblk_ref, k)
        pre = gx_scratch[k] + jnp.dot(h_prev, swt_ref[:],
                                      precision=precision,
                                      preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(pre[:, :H])
        f = jax.nn.sigmoid(pre[:, H:2 * H])
        g = jnp.tanh(pre[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(pre[:, 3 * H:])
        tc = jnp.tanh(c_ref[k].astype(jnp.float32))
        dh = dh_ref[k] + dh_carry[:]
        do = dh * tc
        dc = dh * o * (1.0 - tc * tc) + dc_carry[:]
        di = dc * g
        df = dc * prev_at(c_ref, cprevblk_ref, k)
        dg = dc * i
        dpre = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f),
             dg * (1.0 - g * g), do * o * (1.0 - o)], axis=1)
        dpre = jnp.where(base + k < T, dpre, 0.0)
        dx = jnp.dot(dpre, iw_ref[:], preferred_element_type=jnp.float32)
        dx_ref[k] = dx.astype(dx_ref.dtype)
        dsw_ref[0] += jax.lax.dot_general(
            dpre, h_prev, _BATCH_CONTRACT,
            preferred_element_type=jnp.float32)
        diw_ref[0] += jax.lax.dot_general(
            dpre, x_ref[k].astype(jnp.float32), _BATCH_CONTRACT,
            preferred_element_type=jnp.float32)
        db_ref[0] += jnp.sum(dpre, axis=0, keepdims=True)
        dh_carry[:] = jnp.dot(dpre, sw_ref[:],
                              preferred_element_type=jnp.float32)
        dc_carry[:] = dc * f
        return 0

    run_steps(body, block_t, unroll)


def lstm_bwd_recompute(dh_out, c, h, x, sW, iW, b,
                       block_t=DEFAULT_BLOCK_T, interpret=False,
                       reverse=False, dx_dtype=None, true_len=None,
                       precision=None, unroll=False):
    """Fused LSTM backward with in-kernel pre recompute (no pre
    residual, no materialized c_prev/h_prev shifts — c and h are each
    streamed twice, the second time with a block-shifted index map).
    Returns (d_x, d_sW/d_iW/d_b per-batch-tile partials) like
    lstm_bwd_fusedw."""
    T, B, H = dh_out.shape
    H4 = 4 * H
    D = iW.shape[1]
    assert T % block_t == 0
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    descending = not reverse
    imap, order = _time_maps(ngrid, block_t, descending=descending)
    prevmap = _prevblk_map(ngrid, descending)
    kernel = functools.partial(
        _lstm_bwd_recompute_kernel, block_t=block_t, H=H,
        T=(T if true_len is None else true_len), ngrid=ngrid,
        descending=descending, order=order, precision=precision,
        unroll=unroll)
    wmap3 = lambda ib, it: (ib, 0, 0)
    dx, dsw, diw, db = pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H), prevmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H), prevmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, H), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H4), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, D), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), _WMAP, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, H), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4, D), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H4), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), dx_dtype or jnp.float32),
            jax.ShapeDtypeStruct((nb, H4, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H4, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((block_t, bb, H4), jnp.float32),
        ],
        interpret=interp(interpret),
    )(dh_out, c, c, h, h, x, sW.T, sW, iW.T, iW,
      jnp.asarray(b).reshape(1, H4))
    return dx, dsw, diw, db[:, 0]


def _lstm_bwd_kernel(dh_ref, pre_ref, c_ref, cprev_ref, sw_ref, dpre_ref,
                     dh_carry, dc_carry, *, block_t, H, order,
                     unroll=False):
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        dh_carry[:] = jnp.zeros_like(dh_carry)
        dc_carry[:] = jnp.zeros_like(dc_carry)

    def body(j, _):
        k = order(j)
        dpre, dc_next = _lstm_cell_bwd(dh_ref, pre_ref, c_ref, cprev_ref,
                                       dh_carry, dc_carry, k, H)
        # keep f32 operands here: Mosaic's DEFAULT dot precision already
        # lowers them to ONE bf16 MXU pass (verified bit-identical to
        # explicit bf16 operands on v5e), so pre-casting dpre to bf16
        # only adds vreg repacking — measured -1.2% when tried
        dpre_ref[k] = dpre.astype(dpre_ref.dtype)
        dh_carry[:] = jnp.dot(dpre, sw_ref[:],
                              preferred_element_type=jnp.float32)
        dc_carry[:] = dc_next
        return 0

    run_steps(body, block_t, unroll)


def _lstm_bwd_dx_kernel(dh_ref, pre_ref, c_ref, cprev_ref, sw_ref, iwt_ref,
                        dpre_ref, dx_ref, dh_carry, dc_carry,
                        *, block_t, H, order, unroll=False):
    _lstm_bwd_kernel(dh_ref, pre_ref, c_ref, cprev_ref, sw_ref, dpre_ref,
                     dh_carry, dc_carry, block_t=block_t, H=H, order=order,
                     unroll=unroll)
    _emit_dx(dpre_ref, iwt_ref, dx_ref)


def lstm_bwd(dh_out, pre, c, c_prev, sW, block_t=DEFAULT_BLOCK_T,
             interpret=False, reverse=False, grad_dtype=None,
             iW=None, dx_dtype=None, unroll=False):
    """Fused LSTM backward: per-step gate gradients dpre [T,B,4H].

    `reverse` is the FORWARD direction of the layer; the gradient chain
    walks opposite to it (descending time for natural layers, ascending
    for Reverse'd ones).  `grad_dtype` is the storage dtype of the dpre
    stream (bfloat16 halves its HBM traffic; the recurrent dh/dc chain
    stays float32 in VMEM).

    With `iW` ([4H, D]) the kernel also emits d_x = dpre @ iW ([T,B,D],
    `dx_dtype`) via one per-block GEMM on the VMEM-resident dpre block —
    the return value becomes (dpre, d_x).
    """
    T, B, H = dh_out.shape
    H4 = 4 * H
    assert T % block_t == 0
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    imap, order = _time_maps(ngrid, block_t, descending=not reverse)
    with_dx = iW is not None
    kfn = _lstm_bwd_dx_kernel if with_dx else _lstm_bwd_kernel
    kernel = functools.partial(kfn, block_t=block_t, H=H, order=order,
                               unroll=unroll)

    in_specs = [
        pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, bb, H4), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((H4, H), _WMAP,
                     memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec((block_t, bb, H4), imap,
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((T, B, H4), grad_dtype or dh_out.dtype)
    args = [dh_out, pre, c, c_prev, sW]
    if with_dx:
        D = iW.shape[1]
        # iW stays in its own (f32) dtype like the removed einsum's
        # operand; the stored (grad_dtype) dpre supplies the other side
        args.append(iW)
        in_specs.append(pl.BlockSpec((H4, D), _WMAP,
                                     memory_space=pltpu.VMEM))
        out_specs = [out_specs,
                     pl.BlockSpec((block_t, bb, D), imap,
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((T, B, D),
                                          dx_dtype or jnp.float32)]

    return pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
        ],
        interpret=interp(interpret),
    )(*args)


# -- Fused-gates forwards ------------------------------------------------------
#
# The input-gate GEMM (gx = x @ iW.T + b) used to run as a separate XLA
# GEMM whose [T, B, kH] result made a full HBM round trip into the time
# kernel.  These variants compute the gates INSIDE the kernel, one
# [block_t*B, D] x [D, kH] matmul per grid step (a much better MXU shape
# than the per-step [B, H] recurrent product), so the only forward input
# stream is x itself.  Zero-padded tail rows are masked to keep the gate
# bias from perturbing the carry (matters for reverse=True, which walks
# the padding first).


def _fused_gates(x_ref, iwt_ref, b_ref, gx_scratch, block_t, precision):
    """One per-block gate GEMM into VMEM scratch [block_t, B, kH].

    `precision` follows jax.lax.dot semantics: None (DEFAULT) lowers f32
    operands to ONE bf16 MXU pass with f32 accumulation — measured
    bit-identical to explicitly-bf16 operands on v5e, and the right
    trade for training where the streams are bf16 anyway.  Inference
    passes HIGHEST for true multi-pass f32 (TAIYAKI_TPU_F32_GATES)."""
    bt, B, D = x_ref.shape
    xb = x_ref[:].reshape(bt * B, D)
    gx = jnp.dot(xb, iwt_ref[:], preferred_element_type=jnp.float32,
                 precision=precision)
    gx_scratch[:] = (gx + b_ref[:]).reshape(bt, B, gx.shape[-1])


def _block_base(ngrid, block_t, descending):
    """Global time index of this grid step's first in-block row (as a
    traced value; program_id must be read at kernel top level for
    interpret mode)."""
    pid = pl.program_id(_TIME_DIM)
    block = (ngrid - 1 - pid) if descending else pid
    return block * block_t


def _lstm_fused_fwd_kernel(x_ref, iwt_ref, b_ref, swt_ref,
                           h_ref, c_ref, *rest,
                           block_t, H, T, ngrid, descending, order,
                           precision, emit="pre", unroll=False):
    pre_ref = acts_ref = tc_ref = None
    if emit == "pre":
        pre_ref, h_carry, c_carry, gx_scratch = rest
    elif emit == "acts":
        acts_ref, tc_ref, h_carry, c_carry, gx_scratch = rest
    else:
        h_carry, c_carry, gx_scratch = rest
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)
        c_carry[:] = jnp.zeros_like(c_carry)

    _fused_gates(x_ref, iwt_ref, b_ref, gx_scratch, block_t, precision)
    base = _block_base(ngrid, block_t, descending)

    def body(j, _):
        k = order(j)
        h = h_carry[:]
        c = c_carry[:]
        gx = jnp.where(base + k < T, gx_scratch[k], 0.0)
        pre = gx + jnp.dot(h, swt_ref[:], precision=precision,
                           preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(pre[:, :H])
        f = jax.nn.sigmoid(pre[:, H:2 * H])
        g = jnp.tanh(pre[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(pre[:, 3 * H:])
        c2 = f * c + i * g
        tc2 = jnp.tanh(c2)
        h2 = o * tc2
        h_ref[k] = h2.astype(h_ref.dtype)
        c_ref[k] = c2.astype(c_ref.dtype)
        if pre_ref is not None:
            pre_ref[k] = pre.astype(pre_ref.dtype)
        if acts_ref is not None:
            # post-activation gates + tanh(c): the backward residuals
            # of the transcendental-free backward (tc2 is free here —
            # the forward computes it anyway for h2)
            acts_ref[k] = jnp.concatenate([i, f, g, o],
                                          axis=1).astype(acts_ref.dtype)
            tc_ref[k] = tc2.astype(tc_ref.dtype)
        h_carry[:] = h2
        c_carry[:] = c2
        return 0

    run_steps(body, block_t, unroll)


def lstm_fused_fwd(x, iW, b, sW, block_t=DEFAULT_BLOCK_T, interpret=False,
                   residual_dtype=None, reverse=False, true_len=None,
                   h_dtype=None, precision=None, emit="pre",
                   unroll=False):
    """Fused gates+time LSTM forward.

    Args:
        x: [T, B, D] layer input, T a multiple of block_t (callers pad
            with zeros; padded rows are masked so any traversal direction
            leaves the carry untouched).
        iW: [4H, D] input weights; b: [4H] bias (torch gate order).
        sW: [4H, H] recurrent weights.
        precision: jax.lax.Precision for the in-kernel matmuls (gate
            GEMM and recurrent dot).  None (DEFAULT) = one bf16 MXU pass
            with f32 accumulation — right for training; HIGHEST = true
            multi-pass f32, used by inference via TAIYAKI_TPU_F32_GATES.

    Returns:
        (h [T,B,H] f32, c, pre in residual_dtype); the true (unpadded)
        time length must be sliced by the caller.
    """
    Tp, B, D = x.shape
    H4 = sW.shape[0]
    H = H4 // 4
    res_dt = residual_dtype or x.dtype
    assert Tp % block_t == 0, (Tp, block_t)
    ngrid = Tp // block_t
    bb = block_b_for(B)
    nb = B // bb
    imap, order = _time_maps(ngrid, block_t, descending=reverse)
    kernel = functools.partial(
        _lstm_fused_fwd_kernel, block_t=block_t, H=H,
        T=(Tp if true_len is None else true_len), ngrid=ngrid,
        descending=reverse, order=order, precision=precision,
        emit=emit, unroll=unroll)
    out_specs = [
        pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Tp, B, H), h_dtype or jnp.float32),
        jax.ShapeDtypeStruct((Tp, B, H), res_dt),
    ]
    if emit == "pre":
        out_specs.append(pl.BlockSpec((block_t, bb, H4), imap,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((Tp, B, H4), res_dt))
    elif emit == "acts":
        out_specs += [
            pl.BlockSpec((block_t, bb, H4), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((Tp, B, H4), res_dt),
            jax.ShapeDtypeStruct((Tp, B, H), res_dt),
        ]
    return pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H4), _WMAP,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), _WMAP,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), _WMAP,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((block_t, bb, H4), jnp.float32),
        ],
        interpret=interp(interpret),
    )(x, iW.T, b.reshape(1, H4), sW.T)


def _gru_fused_fwd_kernel(x_ref, iwt_ref, b_ref, swt_ref,
                          h_ref, *maybe_res_and_scratch,
                          block_t, H, T, ngrid, descending, order,
                          precision, emit_residuals=True, unroll=False):
    if emit_residuals:
        gh_ref, gx_ref, h_carry, gx_scratch = maybe_res_and_scratch
    else:
        h_carry, gx_scratch = maybe_res_and_scratch
        gh_ref = gx_ref = None
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    _fused_gates(x_ref, iwt_ref, b_ref, gx_scratch, block_t, precision)
    base = _block_base(ngrid, block_t, descending)

    def body(j, _):
        k = order(j)
        h = h_carry[:]
        gx = jnp.where(base + k < T, gx_scratch[k], 0.0)
        gh = jnp.dot(h, swt_ref[:], precision=precision,
                     preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        h2 = (1.0 - z) * n + z * h
        h_ref[k] = h2.astype(h_ref.dtype)
        if gh_ref is not None:
            gh_ref[k] = gh.astype(gh_ref.dtype)
            gx_ref[k] = gx.astype(gx_ref.dtype)
        h_carry[:] = h2
        return 0

    run_steps(body, block_t, unroll)


def gru_fused_fwd(x, iW, b, sW, block_t=DEFAULT_BLOCK_T, interpret=False,
                  residual_dtype=None, reverse=False, true_len=None,
                  h_dtype=None, precision=None, emit_residuals=True,
                  unroll=False):
    """Fused gates+time GRU forward -> (h [T,B,H] f32, gh, gx in
    residual_dtype).  The gate streams are emitted for the
    residual-reading backward (gru_bwd_fusedw); with
    emit_residuals=False only h is returned — for inference and for the
    recompute backward (gru_bwd_recompute), which rebuilds both streams
    in-kernel.  See lstm_fused_fwd for conventions (incl. precision)."""
    Tp, B, D = x.shape
    H3 = sW.shape[0]
    H = H3 // 3
    res_dt = residual_dtype or x.dtype
    assert Tp % block_t == 0
    ngrid = Tp // block_t
    bb = block_b_for(B)
    nb = B // bb
    imap, order = _time_maps(ngrid, block_t, descending=reverse)
    kernel = functools.partial(
        _gru_fused_fwd_kernel, block_t=block_t, H=H,
        T=(Tp if true_len is None else true_len), ngrid=ngrid,
        descending=reverse, order=order, precision=precision,
        emit_residuals=emit_residuals, unroll=unroll)
    out_specs = [
        pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Tp, B, H), h_dtype or jnp.float32),
    ]
    if emit_residuals:
        out_specs += [
            pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((Tp, B, H3), res_dt),
            jax.ShapeDtypeStruct((Tp, B, H3), res_dt),
        ]
    return pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H3), _WMAP,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), _WMAP,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), _WMAP,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((block_t, bb, H3), jnp.float32),
        ],
        interpret=interp(interpret),
    )(x, iW.T, b.reshape(1, H3), sW.T)


# -- GRU ---------------------------------------------------------------------

def _gru_fwd_kernel(gx_ref, swt_ref, h_ref, gh_ref, h_carry,
                    *, block_t, H, order, precision, unroll=False):
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    def body(j, _):
        k = order(j)
        h = h_carry[:]
        gx = gx_ref[k]
        gh = jnp.dot(h, swt_ref[:], precision=precision,
                     preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        h2 = (1.0 - z) * n + z * h
        h_ref[k] = h2.astype(h_ref.dtype)
        gh_ref[k] = gh.astype(gh_ref.dtype)
        h_carry[:] = h2
        return 0

    run_steps(body, block_t, unroll)


def gru_fwd(gates_x, sW, block_t=DEFAULT_BLOCK_T, interpret=False,
            residual_dtype=None, reverse=False, h_dtype=None,
            precision=None, unroll=False):
    """Fused GRU forward -> (h [T,B,H], gh [T,B,3H]); gh (a backward
    residual) is stored in residual_dtype.  `reverse` runs the recurrence
    backwards in time (grid walked descending; outputs in natural order)."""
    T, B, H3 = gates_x.shape
    H = H3 // 3
    res_dt = residual_dtype or gates_x.dtype
    assert T % block_t == 0
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    imap, order = _time_maps(ngrid, block_t, descending=reverse)
    kernel = functools.partial(_gru_fwd_kernel, block_t=block_t, H=H,
                               order=order, precision=precision,
                               unroll=unroll)
    return pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), _WMAP,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), h_dtype or jnp.float32),
            jax.ShapeDtypeStruct((T, B, H3), res_dt),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32)],
        interpret=interp(interpret),
    )(gates_x, sW.T)


def _gru_cell_bwd(dh_ref, gx_ref, gh_ref, hprev_ref, dh_carry, k, H):
    """One GRU step's gate gradients.  Returns (dgx, dgh, dh*z) f32."""
    gx = gx_ref[k]
    gh = gh_ref[k].astype(jnp.float32)
    h_prev = hprev_ref[k].astype(jnp.float32)
    r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
    dh = dh_ref[k] + dh_carry[:]
    dz = dh * (h_prev - n)
    dn = dh * (1.0 - z)
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * gh[:, 2 * H:]
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)
    dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=1)
    dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
    return dgx, dgh, dh * z


def _gru_bwd_fusedw_kernel(dh_ref, gx_ref, gh_ref, hprev_ref, x_ref,
                           sw_ref, iwt_ref,
                           dx_ref, dsw_ref, diw_ref, db_ref, dh_carry,
                           *, block_t, H, T, ngrid, descending, order,
                           unroll=False):
    """GRU backward with in-kernel weight gradients (see the LSTM
    variant).  Unlike the LSTM, h_prev is already a kernel stream (the
    cell math needs it), so d_sW contracts it directly — no held
    block."""
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        dh_carry[:] = jnp.zeros_like(dh_carry)
        dsw_ref[:] = jnp.zeros_like(dsw_ref)
        diw_ref[:] = jnp.zeros_like(diw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    base = _block_base(ngrid, block_t, descending)

    def body(j, _):
        k = order(j)
        dgx, dgh, dhz = _gru_cell_bwd(dh_ref, gx_ref, gh_ref, hprev_ref,
                                      dh_carry, k, H)
        # mask padded tail rows out of the accumulated gradients (the
        # reverse-direction chain walks INTO the padding with a live
        # carry; see the LSTM variant)
        live = base + k < T
        dgx = jnp.where(live, dgx, 0.0)
        dgh = jnp.where(live, dgh, 0.0)
        dx = jnp.dot(dgx, iwt_ref[:], preferred_element_type=jnp.float32)
        dx_ref[k] = dx.astype(dx_ref.dtype)
        dsw_ref[0] += jax.lax.dot_general(
            dgh, hprev_ref[k].astype(jnp.float32), _BATCH_CONTRACT,
            preferred_element_type=jnp.float32)
        diw_ref[0] += jax.lax.dot_general(
            dgx, x_ref[k].astype(jnp.float32), _BATCH_CONTRACT,
            preferred_element_type=jnp.float32)
        db_ref[0] += jnp.sum(dgx, axis=0, keepdims=True)
        dh_carry[:] = (jnp.dot(dgh, sw_ref[:],
                               preferred_element_type=jnp.float32) + dhz)
        return 0

    run_steps(body, block_t, unroll)


def gru_bwd_fusedw(dh_out, gates_x, gh, h_prev, x, sW, iW,
                   block_t=DEFAULT_BLOCK_T, interpret=False, reverse=False,
                   dx_dtype=None, true_len=None, unroll=False):
    """Fused GRU backward emitting (d_x, d_sW, d_iW, d_b) directly;
    weight gradients as per-batch-tile partials (see lstm_bwd_fusedw).
    Neither gate-gradient stream (dgx/dgh) ever reaches HBM."""
    T, B, H = dh_out.shape
    H3 = 3 * H
    D = iW.shape[1]
    assert T % block_t == 0
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    imap, order = _time_maps(ngrid, block_t, descending=not reverse)
    kernel = functools.partial(
        _gru_bwd_fusedw_kernel, block_t=block_t, H=H,
        T=(T if true_len is None else true_len), ngrid=ngrid,
        descending=not reverse, order=order, unroll=unroll)
    wmap3 = lambda ib, it: (ib, 0, 0)
    dx, dsw, diw, db = pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, D), _WMAP, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3, H), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3, D), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H3), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), dx_dtype or jnp.float32),
            jax.ShapeDtypeStruct((nb, H3, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H3, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, H3), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32)],
        interpret=interp(interpret),
    )(dh_out, gates_x, gh, h_prev, x, sW, iW)
    return dx, dsw, diw, db[:, 0]


def _gru_bwd_recompute_kernel(dh_ref, h_ref, hprevblk_ref, x_ref,
                              swt_ref, sw_ref, iwt_ref, iw_ref, b_ref,
                              dx_ref, dsw_ref, diw_ref, db_ref,
                              dh_carry, gx_scratch, dgx_scratch,
                              dgh_scratch,
                              *, block_t, H, T, ngrid, descending, order,
                              precision, unroll=False):
    """Fused-weights GRU backward that RECOMPUTES both gate streams
    instead of reading stored residuals: gx[t] = (x@iW + b)[t] as one
    per-block GEMM, gh[t] = h[t-1]@sW from the h stream itself (in-block
    row, or the adjacent time block's boundary row via a second
    BlockSpec on the same array — exactly the LSTM recompute's trick).

    This removes BOTH [T, B, 3H] residuals from the forward (which now
    emits only h) and from this kernel's reads, and replaces the stored
    h_prev stream with the shifted view — the GRU layer's HBM traffic
    drops from 7H/step written + 8H+D/step read to H/step written +
    2H+D/step read."""
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        dh_carry[:] = jnp.zeros_like(dh_carry)
        dsw_ref[:] = jnp.zeros_like(dsw_ref)
        diw_ref[:] = jnp.zeros_like(diw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    _fused_gates(x_ref, iwt_ref, b_ref, gx_scratch, block_t, precision)
    base = _block_base(ngrid, block_t, descending)

    def body(j, _):
        k = order(j)
        h_prev = _prev_at(h_ref, hprevblk_ref, k, base, block_t, T,
                          descending)
        gx = gx_scratch[k]
        gh = jnp.dot(h_prev, swt_ref[:], precision=precision,
                     preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        dh = dh_ref[k] + dh_carry[:]
        dz = dh * (h_prev - n)
        dn_pre = dh * (1.0 - z) * (1.0 - n * n)
        dr = dn_pre * gh[:, 2 * H:]
        dr_pre = dr * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)
        dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=1)
        dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        # mask padded tail rows out of the accumulated gradients (the
        # reverse-direction chain walks INTO the padding with a live
        # carry); both gradients park in scratch — the weight/input
        # contractions run block-batched after the loop
        live = base + k < T
        dgx = jnp.where(live, dgx, 0.0)
        dgh = jnp.where(live, dgh, 0.0)
        dgx_scratch[k] = dgx
        dgh_scratch[k] = dgh
        dh_carry[:] = (jnp.dot(dgh, sw_ref[:],
                               preferred_element_type=jnp.float32)
                       + dh * z)
        return 0

    run_steps(body, block_t, unroll)

    bt, B, H3 = dgx_scratch.shape
    dgx_blk = dgx_scratch[:].reshape(bt * B, H3)
    dgh_blk = dgh_scratch[:].reshape(bt * B, H3)
    dx = jnp.dot(dgx_blk, iw_ref[:], preferred_element_type=jnp.float32)
    dx_ref[:] = dx.reshape(bt, B, dx.shape[-1]).astype(dx_ref.dtype)
    hprev = _shifted_prev_block(h_ref, hprevblk_ref, base, T, descending)
    dsw_ref[0] += jax.lax.dot_general(
        dgh_blk, hprev.reshape(bt * B, hprev.shape[-1]), _BATCH_CONTRACT,
        preferred_element_type=jnp.float32)
    diw_ref[0] += jax.lax.dot_general(
        dgx_blk, x_ref[:].astype(jnp.float32).reshape(bt * B, -1),
        _BATCH_CONTRACT, preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dgx_blk, axis=0, keepdims=True)


def gru_bwd_recompute(dh_out, h, x, sW, iW, b,
                      block_t=DEFAULT_BLOCK_T, interpret=False,
                      reverse=False, dx_dtype=None, true_len=None,
                      precision=None, unroll=False):
    """Fused GRU backward with in-kernel gate recompute (no gx/gh
    residuals, no materialized h_prev shift — h is streamed twice, the
    second time with a block-shifted index map).  Returns (d_x,
    d_sW/d_iW/d_b per-batch-tile partials) like gru_bwd_fusedw."""
    T, B, H = dh_out.shape
    H3 = 3 * H
    D = iW.shape[1]
    assert T % block_t == 0
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    descending = not reverse
    imap, order = _time_maps(ngrid, block_t, descending=descending)
    prevmap = _prevblk_map(ngrid, descending)
    kernel = functools.partial(
        _gru_bwd_recompute_kernel, block_t=block_t, H=H,
        T=(T if true_len is None else true_len), ngrid=ngrid,
        descending=descending, order=order, precision=precision,
        unroll=unroll)
    wmap3 = lambda ib, it: (ib, 0, 0)
    dx, dsw, diw, db = pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=[
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, H), prevmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H3), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, D), _WMAP, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), _WMAP, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, bb, D), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3, H), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3, D), wmap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H3), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), dx_dtype or jnp.float32),
            jax.ShapeDtypeStruct((nb, H3, H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H3, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, H3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, H), jnp.float32),
            pltpu.VMEM((block_t, bb, H3), jnp.float32),
            pltpu.VMEM((block_t, bb, H3), jnp.float32),
            pltpu.VMEM((block_t, bb, H3), jnp.float32),
        ],
        interpret=interp(interpret),
    )(dh_out, h, h, x, sW.T, sW, iW.T, iW,
      jnp.asarray(b).reshape(1, H3))
    return dx, dsw, diw, db[:, 0]


def _gru_bwd_kernel(dh_ref, gx_ref, gh_ref, hprev_ref, sw_ref,
                    dgx_ref, dgh_ref, dh_carry, *, block_t, H, order,
                    unroll=False):
    @pl.when(pl.program_id(_TIME_DIM) == 0)
    def _():
        dh_carry[:] = jnp.zeros_like(dh_carry)

    def body(j, _):
        k = order(j)
        dgx, dgh, dhz = _gru_cell_bwd(dh_ref, gx_ref, gh_ref, hprev_ref,
                                      dh_carry, k, H)
        # f32 recurrent dot regardless of grad-stream dtype — see the
        # matching note in _lstm_bwd_kernel
        dgx_ref[k] = dgx.astype(dgx_ref.dtype)
        dgh_ref[k] = dgh.astype(dgh_ref.dtype)
        dh_carry[:] = (jnp.dot(dgh, sw_ref[:],
                               preferred_element_type=jnp.float32)
                       + dhz)
        return 0

    run_steps(body, block_t, unroll)


def _gru_bwd_dx_kernel(dh_ref, gx_ref, gh_ref, hprev_ref, sw_ref, iwt_ref,
                       dgx_ref, dgh_ref, dx_ref, dh_carry,
                       *, block_t, H, order, unroll=False):
    _gru_bwd_kernel(dh_ref, gx_ref, gh_ref, hprev_ref, sw_ref,
                    dgx_ref, dgh_ref, dh_carry,
                    block_t=block_t, H=H, order=order, unroll=unroll)
    _emit_dx(dgx_ref, iwt_ref, dx_ref)


def gru_bwd(dh_out, gates_x, gh, h_prev, sW, block_t=DEFAULT_BLOCK_T,
            interpret=False, reverse=False, grad_dtype=None,
            iW=None, dx_dtype=None, unroll=False):
    """Fused GRU backward -> (dgx [T,B,3H], dgh [T,B,3H]).

    `reverse` is the FORWARD direction of the layer; the gradient chain
    walks opposite to it.  `grad_dtype` stores the two gradient streams
    (bfloat16 halves their HBM traffic; the dh chain stays float32).

    With `iW` ([3H, D]) the kernel also emits d_x = dgx @ iW ([T,B,D],
    `dx_dtype`) via one per-block GEMM on the VMEM-resident dgx block —
    the return value becomes (dgx, dgh, d_x).
    """
    T, B, H = dh_out.shape
    H3 = 3 * H
    assert T % block_t == 0
    ngrid = T // block_t
    bb = block_b_for(B)
    nb = B // bb
    imap, order = _time_maps(ngrid, block_t, descending=not reverse)
    with_dx = iW is not None
    kfn = _gru_bwd_dx_kernel if with_dx else _gru_bwd_kernel
    kernel = functools.partial(kfn, block_t=block_t, H=H, order=order,
                               unroll=unroll)

    gdt = grad_dtype or dh_out.dtype
    in_specs = [
        pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, bb, H), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((H3, H), _WMAP,
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_t, bb, H3), imap, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, B, H3), gdt),
        jax.ShapeDtypeStruct((T, B, H3), gdt),
    ]
    args = [dh_out, gates_x, gh, h_prev, sW]
    if with_dx:
        D = iW.shape[1]
        args.append(iW)
        in_specs.append(pl.BlockSpec((H3, D), _WMAP,
                                     memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec((block_t, bb, D), imap,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, B, D),
                                              dx_dtype or jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(nb, ngrid),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bb, H), jnp.float32)],
        interpret=interp(interpret),
    )(*args)
