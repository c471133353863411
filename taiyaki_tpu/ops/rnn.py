"""Fast recurrent scans with custom VJP.

XLA's autodiff of a `lax.scan` RNN accumulates the weight gradient with a
transposed outer-product matmul *inside every backward step*, which on TPU
runs ~100x slower than the forward scan.  These custom-VJP scans instead:

* keep only elementwise math plus ONE [B,kH]x[kH,H] matmul in the backward
  loop (the hidden-state gradient chain), and
* compute the weight gradients after the loop as a single large
  [T*B, kH]^T x [T*B, H] GEMM over the stacked per-step gate gradients —
  exactly the shape the MXU wants.

Two API levels:

* `lstm_scan(gates_x, sW, reverse)` / `gru_scan(...)` — recurrence over
  precomputed input gates (the classic formulation; CPU fallback path).
* `lstm_layer(x, iW, b, sW, reverse)` / `gru_layer(...)` — whole layer
  including the input-gate GEMM.  On TPU the gates are computed INSIDE
  the Pallas kernel (one [block_t*B, D] matmul per grid block), so the
  [T, B, kH] gate tensor never round-trips through HBM.  layers.py
  dispatches here.

`reverse=True` runs the recurrence backwards in time with inputs and
outputs in NATURAL time order.  The reference implements its `Reverse`
combinator by flipping the data around the inner layer
(taiyaki/layers.py:117-154); here the kernels walk time in the requested
direction instead and no flipped copy is ever materialized.

Mixed-precision streams (TPU only; accumulation is always f32):
* backward residuals (LSTM c/pre, GRU gh) are stored bfloat16;
* gradient streams (dh in, dpre/dgx/dgh out) are bfloat16 unless
  TAIYAKI_TPU_F32_GRADS=1; the fused d_x GEMM consumes the stored
  (bf16) gradient block, while the backward chain's recurrent dot
  stays f32 (bf16 operands measured slower there — repacking cost);
* input-gate streams are bfloat16 unless TAIYAKI_TPU_F32_GATES=1
  (bin/basecall.py and bin/prepare_mapped_reads.py set it — inference
  does not pay accuracy for a training-throughput trade);
* the in-kernel forward matmuls run at Mosaic DEFAULT precision (one
  bf16 MXU pass with f32 accumulation — bit-identical to explicitly
  bf16 operands on v5e) in training; under TAIYAKI_TPU_F32_GATES=1
  they switch to Precision.HIGHEST (true multi-pass f32) so inference
  matches the CPU scan path as closely as the hardware allows.

Semantics match taiyaki_tpu.layers.Lstm / GruMod (torch cell equations
with the redundant hidden bias pinned to zero).

Measured on TPU v5e (T=800, B=64, H=256): fwd+bwd 82ms -> ~4ms per layer.
"""

import os

import jax
import jax.numpy as jnp

# Unrolling the time loop amortizes TPU scan-iteration overhead (the
# dominant cost for small recurrent matmuls): measured 54ms -> 39ms per
# full train step at unroll=8 on v5e.
_UNROLL = 8


def _use_pallas(batch_size):
    """Dispatch the time loops to the fused Pallas kernels on TPU.

    Trace-time constant; disable with TAIYAKI_TPU_NO_PALLAS=1.

    Batches that aren't sublane (8) aligned fall back to the XLA scan
    path: the kernels collapse (block_t, B, kH) -> (block_t*B, kH) for
    the gate GEMMs, and Mosaic rejects that shape cast for B % 8 != 0
    ("infer-vector-layout: unsupported shape cast", measured on v5e —
    B=9 fails, B=8/16/64 compile at every hidden size probed).  Odd
    batches only arise from tiny smoke configs; production sub-batch
    sizes are 8-aligned by the trainer.
    """
    if os.environ.get("TAIYAKI_TPU_NO_PALLAS") == "1":
        return False
    if batch_size % 8 != 0:
        return False
    if os.environ.get("TAIYAKI_TPU_PALLAS_INTERPRET") == "1":
        # Force the Pallas path off-TPU (interpret mode): mesh parity tests.
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _recompute_pre(cell):
    """Whether `cell`'s layer backward recomputes its gate streams
    in-kernel instead of reading stored residuals.

    The trade differs per cell, so the defaults were measured separately
    on a v5e chip (misc/ab_train_variants.py, bs256 production shape):

    * LSTM: recompute is ~10% SLOWER (6307 vs 6927 chunks/s) — it drops
      only the pre residual ([T,B,4H]) while adding a second sequential
      matmul (h_prev·sW) to every backward step, and the backward chain
      is latency-bound.  Default: stored-pre (this was the round-2
      regression behind BENCH_r02's 6316 vs the claimed 6919).
    * GRU: recompute is ~4% FASTER (3254 vs 3135 chunks/s) — it drops
      TWO residuals (gx+gh, 2x[T,B,3H]) plus the materialized h_prev
      stream, against the same one extra matmul.  Default: recompute.

    TAIYAKI_TPU_NO_RECOMPUTE=1 forces stored residuals for both cells;
    TAIYAKI_TPU_RECOMPUTE=1 forces recompute for both (trace-time
    constants)."""
    if os.environ.get("TAIYAKI_TPU_NO_RECOMPUTE") == "1":
        return False
    if os.environ.get("TAIYAKI_TPU_RECOMPUTE") == "1":
        return True
    return cell == "gru"


def _acts_bwd():
    """LSTM layer backward consumes STORED post-activation gates +
    tanh(c) instead of recomputing the nonlinearities from the stored
    pre residual: zero transcendentals in the backward loop (a timing
    probe bounded their cost at +3.9% of the step), for one extra
    [T,B,H] forward stream (tanh(c), computed by the forward anyway).
    TAIYAKI_TPU_ACTS_BWD=0 restores the stored-pre path (trace-time
    constant).  Measured on v5e at bs256: see docs/performance.md."""
    return os.environ.get("TAIYAKI_TPU_ACTS_BWD", "1") == "1"


def _gate_stream_dtype():
    """Storage dtype for the input-gate stream gx fed to the forward
    kernels (and kept as the GRU backward residual).  bfloat16 halves the
    largest forward HBM stream; the cast fuses into the producing GEMM's
    epilogue.  Arithmetic stays f32.  TAIYAKI_TPU_F32_GATES=1 restores
    f32 (inference CLIs set it so basecalls keep full precision).
    """
    if os.environ.get("TAIYAKI_TPU_F32_GATES") == "1":
        return None
    return jnp.bfloat16


def _act_stream_dtype():
    """Storage dtype for the inter-layer activation stream h on the fused
    LAYER path (lstm_layer/gru_layer).

    Default bfloat16 since the fused-weight-gradient backward: h is now
    written once and re-read TWICE (next layer's gate GEMM + the bwd
    kernel's in-kernel d_sW pairing), and bf16 measured +5.2% at bs256
    (6919 vs 6578 chunks/s) where it was neutral when only the forward
    touched it.  Converges to the same loss (30-step trajectories match
    after step ~20; r1 measurement).  TAIYAKI_TPU_BF16_ACTS=0 restores
    f32; TAIYAKI_TPU_F32_GATES (inference CLIs) forces f32 regardless so
    basecalls keep full precision.
    """
    if os.environ.get("TAIYAKI_TPU_F32_GATES") == "1":
        return None
    if os.environ.get("TAIYAKI_TPU_BF16_ACTS") == "0":
        return None
    return jnp.bfloat16


def _mm_precision():
    """Precision for the forward kernels' in-kernel matmuls.  None
    (Mosaic DEFAULT) = one bf16 MXU pass, f32 accumulate — training.
    TAIYAKI_TPU_F32_GATES=1 (inference CLIs) requests HIGHEST: true
    multi-pass f32, minimizing TPU-vs-CPU basecall divergence."""
    if os.environ.get("TAIYAKI_TPU_F32_GATES") == "1":
        return jax.lax.Precision.HIGHEST
    return None


def _grad_stream_dtype():
    """Storage dtype for the backward gradient streams (dh in, dpre/dgx/
    dgh out) of the Pallas kernels.  bfloat16 halves their HBM traffic —
    the kernels are stream-bound, arithmetic stays f32, and the weight
    gradients accumulate in f32.  TAIYAKI_TPU_F32_GRADS=1 restores f32.
    """
    if os.environ.get("TAIYAKI_TPU_F32_GRADS") == "1":
        return None
    return jnp.bfloat16


def _pad_time(x, multiple):
    """Zero-pad the leading (time) axis up to a multiple."""
    T = x.shape[0]
    pad = (-T) % multiple
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def _prev_state(x, reverse):
    """States *entering* each step: x[t-1] for a natural scan, x[t+1] for
    a reversed one (zero state at the boundary)."""
    zero = jnp.zeros((1,) + x.shape[1:], x.dtype)
    if reverse:
        return jnp.concatenate([x[1:], zero])
    return jnp.concatenate([zero, x[:-1]])


# -- LSTM --------------------------------------------------------------------

def _lstm_fwd_core(gates_x, sW, reverse=False):
    T, B, H4 = gates_x.shape
    H = H4 // 4
    h0 = jnp.zeros((B, H), gates_x.dtype)

    def step(carry, gx):
        h, c = carry
        pre = gx + h @ sW.T
        i = jax.nn.sigmoid(pre[:, :H])
        f = jax.nn.sigmoid(pre[:, H:2 * H])
        g = jnp.tanh(pre[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(pre[:, 3 * H:])
        c2 = f * c + i * g
        h2 = o * jnp.tanh(c2)
        return (h2, c2), (h2, c2, pre)

    _, (h, c, pre) = jax.lax.scan(step, (h0, h0), gates_x,
                                  unroll=_UNROLL, reverse=reverse)
    return h, (h, c, pre, sW)


def _lstm_fwd_pallas(gates_x, sW, reverse):
    from taiyaki_tpu.ops import pallas_rnn
    T = gates_x.shape[0]
    bt = pallas_rnn.block_t_for(gates_x.shape[1])
    gxdt = _gate_stream_dtype()
    gx = _pad_time(gates_x.astype(gxdt or gates_x.dtype), bt)
    # residuals stream in bf16 (arithmetic and h stay f32): halves
    # their HBM traffic; gates are recomputed from bf16 pre in bwd
    h, c, pre = pallas_rnn.lstm_fwd(gx, sW, block_t=bt,
                                    residual_dtype=jnp.bfloat16,
                                    reverse=reverse,
                                    precision=_mm_precision(),
                                    unroll=True)
    return h[:T], c[:T], pre[:T]


def _lstm_dpre(h, c, pre, sW, dh_out, reverse, iW=None, dx_dtype=None):
    """Backward gradient chain -> per-step gate gradients dpre [T,B,4H]
    (equal to d gates_x).  Pallas kernel on TPU, scan elsewhere.

    With `iW` also returns d_x = dpre @ iW ([T,B,D], `dx_dtype`) —
    fused into the Pallas kernel (the dpre block is contracted while
    still VMEM-resident, so the d_x GEMM never re-reads the gradient
    stream from HBM); an einsum on the scan fallback."""
    T, B, H = h.shape
    c_prev = _prev_state(c, reverse)
    if _use_pallas(B):
        from taiyaki_tpu.ops import pallas_rnn
        bt = pallas_rnn.block_t_for(B)
        gdt = _grad_stream_dtype()
        out = pallas_rnn.lstm_bwd(
            _pad_time(dh_out.astype(gdt or dh_out.dtype), bt),
            _pad_time(pre, bt),
            _pad_time(c, bt), _pad_time(c_prev, bt), sW,
            block_t=bt, reverse=reverse, grad_dtype=gdt,
            iW=iW, dx_dtype=dx_dtype, unroll=True)
        if iW is not None:
            dpre, d_x = out
            return dpre[:T], d_x[:T]
        return out[:T]

    def step(carry, xs):
        dh_next, dc_next = carry
        dh_t, pre_t, c_t, c_prev_t = xs
        i = jax.nn.sigmoid(pre_t[:, :H])
        f = jax.nn.sigmoid(pre_t[:, H:2 * H])
        g = jnp.tanh(pre_t[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(pre_t[:, 3 * H:])
        tc = jnp.tanh(c_t)
        dh = dh_t + dh_next
        do = dh * tc
        dc = dh * o * (1.0 - tc * tc) + dc_next
        di = dc * g
        df = dc * c_prev_t
        dg = dc * i
        dpre = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f),
             dg * (1.0 - g * g), do * o * (1.0 - o)], axis=1)
        dh_prev = dpre @ sW
        dc_prev = dc * f
        return (dh_prev, dc_prev), dpre

    zero = jnp.zeros((B, H), h.dtype)
    # the gradient chain walks opposite to the forward direction
    _, dpre_all = jax.lax.scan(step, (zero, zero),
                               (dh_out, pre, c, c_prev),
                               reverse=not reverse, unroll=_UNROLL)
    if iW is not None:
        d_x = jnp.einsum("tbg,gd->tbd", dpre_all, iW,
                         preferred_element_type=jnp.float32)
        return dpre_all, d_x.astype(dx_dtype or jnp.float32)
    return dpre_all


def _make_lstm_scan(reverse):
    @jax.custom_vjp
    def scan_fn(gates_x, sW):
        # NOTE: custom_vjp evaluates THIS function outside differentiation
        # (inference); f_fwd below only runs under grad.  Dispatch to the
        # Pallas kernel here too so basecalling gets the fused time loop.
        if _use_pallas(gates_x.shape[1]):
            h, _, _ = _lstm_fwd_pallas(gates_x, sW, reverse)
            return h
        h, _ = _lstm_fwd_core(gates_x, sW, reverse)
        return h

    def fwd(gates_x, sW):
        # NOTE: _use_pallas(B) is a trace-time constant, so fwd and bwd
        # agree on the residual structure.
        if _use_pallas(gates_x.shape[1]):
            h, c, pre = _lstm_fwd_pallas(gates_x, sW, reverse)
            return h, (h, c, pre, sW)
        return _lstm_fwd_core(gates_x, sW, reverse)

    def bwd(res, dh_out):
        h, c, pre, sW = res
        dpre = _lstm_dpre(h, c, pre, sW, dh_out, reverse)
        # Weight gradient as one big GEMM over all steps.
        d_sW = jnp.einsum("tbg,tbh->gh", dpre, _prev_state(h, reverse),
                          preferred_element_type=jnp.float32)
        # cotangent dtype must match the primal; XLA fuses the upcast
        # into the consuming GEMMs (no f32 copy in HBM)
        return dpre.astype(dh_out.dtype), d_sW

    scan_fn.defvjp(fwd, bwd)
    return scan_fn


_lstm_scan_fns = {False: _make_lstm_scan(False), True: _make_lstm_scan(True)}


def lstm_scan(gates_x, sW, reverse=False):
    """LSTM over time given precomputed input gates.

    Args:
        gates_x: [T, B, 4H] = x @ iW.T + b (torch gate order i,f,g,o).
        sW: [4H, H] recurrent weights.
        reverse: run the recurrence backwards in time (inputs/outputs stay
            in natural time order).

    Returns:
        h: [T, B, H] hidden states.
    """
    return _lstm_scan_fns[bool(reverse)](gates_x, sW)


def _make_lstm_layer(reverse):
    @jax.custom_vjp
    def layer_fn(x, iW, b, sW):
        # evaluated outside differentiation (inference) — see scan_fn note
        if _use_pallas(x.shape[1]):
            from taiyaki_tpu.ops import pallas_rnn
            T = x.shape[0]
            bt = pallas_rnn.block_t_for(x.shape[1])
            out = pallas_rnn.lstm_fused_fwd(
                _pad_time(x, bt), iW, b, sW, block_t=bt,
                residual_dtype=jnp.bfloat16, reverse=reverse, true_len=T,
                h_dtype=_act_stream_dtype(), precision=_mm_precision(),
                emit=None, unroll=True)
            return out[0][:T]
        h, _ = _lstm_fwd_core(x @ iW.T + b, sW, reverse)
        return h

    def fwd(x, iW, b, sW):
        if _use_pallas(x.shape[1]):
            from taiyaki_tpu.ops import pallas_rnn
            T = x.shape[0]
            bt = pallas_rnn.block_t_for(x.shape[1])
            if _recompute_pre("lstm"):
                h, c = pallas_rnn.lstm_fused_fwd(
                    _pad_time(x, bt), iW, b, sW, block_t=bt,
                    residual_dtype=jnp.bfloat16, reverse=reverse,
                    true_len=T, h_dtype=_act_stream_dtype(),
                    precision=_mm_precision(), emit=None,
                    unroll=True)
                return h[:T], (x, h[:T], c[:T], None, iW, sW, b)
            if _acts_bwd():
                h, c, acts, tc = pallas_rnn.lstm_fused_fwd(
                    _pad_time(x, bt), iW, b, sW, block_t=bt,
                    residual_dtype=jnp.bfloat16, reverse=reverse,
                    true_len=T, h_dtype=_act_stream_dtype(),
                    precision=_mm_precision(), emit="acts",
                    unroll=True)
                return h[:T], (x, h[:T], c[:T],
                               (acts[:T], tc[:T]), iW, sW, b)
            h, c, pre = pallas_rnn.lstm_fused_fwd(
                _pad_time(x, bt), iW, b, sW, block_t=bt,
                residual_dtype=jnp.bfloat16, reverse=reverse,
                true_len=T, h_dtype=_act_stream_dtype(),
                precision=_mm_precision(), unroll=True)
            return h[:T], (x, h[:T], c[:T], pre[:T], iW, sW, b)
        h, (h_, c, pre, _) = _lstm_fwd_core(x @ iW.T + b, sW, reverse)
        return h, (x, h, c, pre, iW, sW, b)

    def bwd(res, dh_out):
        x, h, c, pre, iW, sW, b = res
        if (_use_pallas(dh_out.shape[1]) and not _recompute_pre("lstm")
                and _acts_bwd()):
            # transcendental-free backward from stored activations
            acts, tc = pre
            from taiyaki_tpu.ops import pallas_rnn
            T = x.shape[0]
            bt = pallas_rnn.block_t_for(dh_out.shape[1])
            gdt = _grad_stream_dtype()
            c_prev = _prev_state(c, reverse)
            d_x, dsw, diw, db = pallas_rnn.lstm_bwd_acts(
                _pad_time(dh_out.astype(gdt or dh_out.dtype), bt),
                _pad_time(acts, bt), _pad_time(tc, bt),
                _pad_time(c_prev, bt), _pad_time(h, bt),
                _pad_time(x, bt), sW, iW, block_t=bt, reverse=reverse,
                dx_dtype=x.dtype, true_len=T, unroll=True)
            return (d_x[:T], jnp.sum(diw, 0).astype(iW.dtype),
                    jnp.sum(db, 0), jnp.sum(dsw, 0).astype(sW.dtype))
        if _use_pallas(dh_out.shape[1]) and _recompute_pre("lstm"):
            from taiyaki_tpu.ops import pallas_rnn
            T = x.shape[0]
            bt = pallas_rnn.block_t_for(dh_out.shape[1])
            gdt = _grad_stream_dtype()
            d_x, dsw, diw, db = pallas_rnn.lstm_bwd_recompute(
                _pad_time(dh_out.astype(gdt or dh_out.dtype), bt),
                _pad_time(c, bt), _pad_time(h, bt), _pad_time(x, bt),
                sW, iW, b, block_t=bt, reverse=reverse,
                dx_dtype=x.dtype, true_len=T,
                precision=_mm_precision(), unroll=True)
            return (d_x[:T], jnp.sum(diw, 0).astype(iW.dtype),
                    jnp.sum(db, 0), jnp.sum(dsw, 0).astype(sW.dtype))
        if _use_pallas(dh_out.shape[1]):
            # fully-fused backward: weight gradients accumulate inside
            # the kernel, so the gate-gradient stream never reaches HBM
            # (the separate d_sW/d_iW einsums measured ~3.1 ms/layer at
            # bs256 — ~30% of the whole train step across 5 layers)
            from taiyaki_tpu.ops import pallas_rnn
            T = x.shape[0]
            bt = pallas_rnn.block_t_for(dh_out.shape[1])
            gdt = _grad_stream_dtype()
            c_prev = _prev_state(c, reverse)
            d_x, dsw, diw, db = pallas_rnn.lstm_bwd_fusedw(
                _pad_time(dh_out.astype(gdt or dh_out.dtype), bt),
                _pad_time(pre, bt), _pad_time(c, bt),
                _pad_time(c_prev, bt), _pad_time(h, bt),
                _pad_time(x, bt), sW, iW, block_t=bt, reverse=reverse,
                dx_dtype=x.dtype, true_len=T, unroll=True)
            return (d_x[:T], jnp.sum(diw, 0).astype(iW.dtype),
                    jnp.sum(db, 0), jnp.sum(dsw, 0).astype(sW.dtype))
        dpre, d_x = _lstm_dpre(h, c, pre, sW, dh_out, reverse,
                               iW=iW, dx_dtype=x.dtype)
        d_sW = jnp.einsum("tbg,tbh->gh", dpre, _prev_state(h, reverse),
                          preferred_element_type=jnp.float32)
        d_iW = jnp.einsum("tbg,tbd->gd", dpre, x,
                          preferred_element_type=jnp.float32)
        d_b = jnp.sum(dpre, axis=(0, 1), dtype=jnp.float32)
        return (d_x, d_iW.astype(iW.dtype), d_b,
                d_sW.astype(sW.dtype))

    layer_fn.defvjp(fwd, bwd)
    return layer_fn


_lstm_layer_fns = {False: _make_lstm_layer(False),
                   True: _make_lstm_layer(True)}


def lstm_layer(x, iW, b, sW, reverse=False):
    """Whole LSTM layer: h = lstm(x @ iW.T + b; sW), direction `reverse`.

    On TPU the gate GEMM runs inside the Pallas kernel (one
    [block_t*B, D] matmul per grid block) so the [T, B, 4H] gate tensor
    never visits HBM; elsewhere it lowers to GEMM + lax.scan.
    """
    return _lstm_layer_fns[bool(reverse)](x, iW, b, sW)


# -- GRU (torch/CUDNN variant: reset gate applied to the hidden matmul) ------

def _gru_fwd_core(gates_x, sW, reverse=False):
    T, B, H3 = gates_x.shape
    H = H3 // 3
    h0 = jnp.zeros((B, H), gates_x.dtype)

    def step(h, gx):
        gh = h @ sW.T
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        h2 = (1.0 - z) * n + z * h
        return h2, (h2, r, z, n, gh[:, 2 * H:])

    _, (h, r, z, n, ghn) = jax.lax.scan(step, h0, gates_x,
                                        unroll=_UNROLL, reverse=reverse)
    return h, (h, r, z, n, ghn, sW)


def _gru_dgrads_scan(res, dh_out, reverse):
    """Scan-path GRU backward -> (dgx [T,B,3H], dgh [T,B,3H])."""
    h, r, z, n, ghn, sW = res
    T, B, H = h.shape
    h_prev = _prev_state(h, reverse)

    def step(dh_next, xs):
        dh_t, r_t, z_t, n_t, ghn_t, h_prev_t = xs
        dh = dh_t + dh_next
        dz = dh * (h_prev_t - n_t)
        dn = dh * (1.0 - z_t)
        dn_pre = dn * (1.0 - n_t * n_t)
        dr = dn_pre * ghn_t
        dr_pre = dr * r_t * (1.0 - r_t)
        dz_pre = dz * z_t * (1.0 - z_t)
        # gradient wrt the hidden-matmul outputs gh = h_prev @ sW.T
        dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r_t], axis=1)
        dh_prev = dgh @ sW + dh * z_t
        # gradient wrt the input gates gx
        dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
        return dh_prev, (dgx, dgh)

    zero = jnp.zeros((B, H), h.dtype)
    _, (dgx_all, dgh_all) = jax.lax.scan(
        step, zero, (dh_out, r, z, n, ghn, h_prev),
        reverse=not reverse, unroll=_UNROLL)
    return dgx_all, dgh_all


def _gru_dgrads_pallas(h, gx, gh, sW, dh_out, reverse, iW=None,
                       dx_dtype=None):
    """With `iW` also returns d_x = dgx @ iW fused into the kernel
    (see _lstm_dpre)."""
    from taiyaki_tpu.ops import pallas_rnn
    T, B, H = h.shape
    bt = pallas_rnn.block_t_for(B)
    gdt = _grad_stream_dtype()
    h_prev = _prev_state(h, reverse)
    out = pallas_rnn.gru_bwd(
        _pad_time(dh_out.astype(gdt or dh_out.dtype), bt),
        _pad_time(gx, bt),
        _pad_time(gh, bt), _pad_time(h_prev, bt), sW,
        block_t=bt, reverse=reverse, grad_dtype=gdt,
        iW=iW, dx_dtype=dx_dtype, unroll=True)
    if iW is not None:
        dgx, dgh, d_x = out
        return dgx[:T], dgh[:T], d_x[:T]
    dgx, dgh = out
    return dgx[:T], dgh[:T]


def _make_gru_scan(reverse):
    @jax.custom_vjp
    def scan_fn(gates_x, sW):
        # evaluated outside differentiation (inference) — see lstm note
        if _use_pallas(gates_x.shape[1]):
            from taiyaki_tpu.ops import pallas_rnn
            T = gates_x.shape[0]
            bt = pallas_rnn.block_t_for(gates_x.shape[1])
            gxdt = _gate_stream_dtype()
            h, _ = pallas_rnn.gru_fwd(
                _pad_time(gates_x.astype(gxdt or gates_x.dtype), bt),
                sW, block_t=bt, residual_dtype=jnp.bfloat16,
                reverse=reverse, precision=_mm_precision(),
                unroll=True)
            return h[:T]
        h, _ = _gru_fwd_core(gates_x, sW, reverse)
        return h

    def fwd(gates_x, sW):
        if _use_pallas(gates_x.shape[1]):
            from taiyaki_tpu.ops import pallas_rnn
            T = gates_x.shape[0]
            bt = pallas_rnn.block_t_for(gates_x.shape[1])
            gxdt = _gate_stream_dtype()
            gx_c = gates_x.astype(gxdt or gates_x.dtype)
            h, gh = pallas_rnn.gru_fwd(_pad_time(gx_c, bt), sW,
                                       block_t=bt,
                                       residual_dtype=jnp.bfloat16,
                                       reverse=reverse,
                                       precision=_mm_precision(),
                                       unroll=True)
            # Residuals for the Pallas backward: gates (in their stream
            # dtype, re-read by the bwd kernel) + hidden matmuls.
            return h[:T], (h[:T], gx_c, gh[:T], sW)
        return _gru_fwd_core(gates_x, sW, reverse)

    def bwd(res, dh_out):
        if _use_pallas(dh_out.shape[1]):
            h, gx, gh, sW = res
            dgx, dgh = _gru_dgrads_pallas(h, gx, gh, sW, dh_out, reverse)
        else:
            h = res[0]
            sW = res[-1]
            dgx, dgh = _gru_dgrads_scan(res, dh_out, reverse)
        d_sW = jnp.einsum("tbg,tbh->gh", dgh, _prev_state(h, reverse),
                          preferred_element_type=jnp.float32)
        return dgx.astype(dh_out.dtype), d_sW

    scan_fn.defvjp(fwd, bwd)
    return scan_fn


_gru_scan_fns = {False: _make_gru_scan(False), True: _make_gru_scan(True)}


def gru_scan(gates_x, sW, reverse=False):
    """GRU over time given precomputed input gates.

    Args:
        gates_x: [T, B, 3H] = x @ iW.T + b (CUDNN gate order r,z,n).
        sW: [3H, H] recurrent weights.
        reverse: run the recurrence backwards in time (inputs/outputs stay
            in natural time order).

    Returns:
        h: [T, B, H] hidden states.
    """
    return _gru_scan_fns[bool(reverse)](gates_x, sW)


def _make_gru_layer(reverse):
    @jax.custom_vjp
    def layer_fn(x, iW, b, sW):
        # evaluated outside differentiation (inference) — see lstm note
        if _use_pallas(x.shape[1]):
            from taiyaki_tpu.ops import pallas_rnn
            T = x.shape[0]
            bt = pallas_rnn.block_t_for(x.shape[1])
            h, = pallas_rnn.gru_fused_fwd(
                _pad_time(x, bt), iW, b, sW, block_t=bt,
                residual_dtype=jnp.bfloat16, reverse=reverse, true_len=T,
                h_dtype=_act_stream_dtype(), precision=_mm_precision(),
                emit_residuals=False, unroll=True)
            return h[:T]
        h, _ = _gru_fwd_core(x @ iW.T + b, sW, reverse)
        return h

    def fwd(x, iW, b, sW):
        if _use_pallas(x.shape[1]):
            from taiyaki_tpu.ops import pallas_rnn
            T = x.shape[0]
            bt = pallas_rnn.block_t_for(x.shape[1])
            if _recompute_pre("gru"):
                # recompute backward: the forward emits ONLY h — both
                # gate streams are rebuilt inside gru_bwd_recompute
                h, = pallas_rnn.gru_fused_fwd(
                    _pad_time(x, bt), iW, b, sW, block_t=bt,
                    residual_dtype=jnp.bfloat16, reverse=reverse,
                    true_len=T, h_dtype=_act_stream_dtype(),
                    precision=_mm_precision(), emit_residuals=False,
                    unroll=True)
                return h[:T], (x, h[:T], None, None, iW, sW, b)
            # the GRU backward re-reads the input gates, so the fused
            # kernel emits them as a bf16 residual stream alongside h/gh
            h, gh, gx = pallas_rnn.gru_fused_fwd(
                _pad_time(x, bt), iW, b, sW, block_t=bt,
                residual_dtype=jnp.bfloat16, reverse=reverse,
                true_len=T, h_dtype=_act_stream_dtype(),
                precision=_mm_precision(), unroll=True)
            return h[:T], (x, h[:T], gx[:T], gh[:T], iW, sW, b)
        h, (h_, r, z, n, ghn, _) = _gru_fwd_core(x @ iW.T + b, sW, reverse)
        return h, (x, (h, r, z, n, ghn, sW), iW, sW, b)

    def bwd(res, dh_out):
        if _use_pallas(dh_out.shape[1]) and _recompute_pre("gru"):
            x, h, _, _, iW, sW, b = res
            from taiyaki_tpu.ops import pallas_rnn
            T = x.shape[0]
            bt = pallas_rnn.block_t_for(dh_out.shape[1])
            gdt = _grad_stream_dtype()
            d_x, dsw, diw, db = pallas_rnn.gru_bwd_recompute(
                _pad_time(dh_out.astype(gdt or dh_out.dtype), bt),
                _pad_time(h, bt), _pad_time(x, bt), sW, iW, b,
                block_t=bt, reverse=reverse, dx_dtype=x.dtype,
                true_len=T, precision=_mm_precision(), unroll=True)
            return (d_x[:T], jnp.sum(diw, 0).astype(iW.dtype),
                    jnp.sum(db, 0), jnp.sum(dsw, 0).astype(sW.dtype))
        if _use_pallas(dh_out.shape[1]):
            # fully-fused backward — see the matching LSTM-layer note
            x, h, gx, gh, iW, sW, b = res
            from taiyaki_tpu.ops import pallas_rnn
            T = x.shape[0]
            bt = pallas_rnn.block_t_for(dh_out.shape[1])
            gdt = _grad_stream_dtype()
            h_prev = _prev_state(h, reverse)
            d_x, dsw, diw, db = pallas_rnn.gru_bwd_fusedw(
                _pad_time(dh_out.astype(gdt or dh_out.dtype), bt),
                _pad_time(gx, bt), _pad_time(gh, bt),
                _pad_time(h_prev, bt), _pad_time(x, bt), sW, iW,
                block_t=bt, reverse=reverse, dx_dtype=x.dtype,
                true_len=T, unroll=True)
            return (d_x[:T], jnp.sum(diw, 0).astype(iW.dtype),
                    jnp.sum(db, 0), jnp.sum(dsw, 0).astype(sW.dtype))
        x, core_res, iW, sW, b = res
        h = core_res[0]
        dgx, dgh = _gru_dgrads_scan(core_res, dh_out, reverse)
        d_x = jnp.einsum("tbg,gd->tbd", dgx, iW,
                         preferred_element_type=jnp.float32
                         ).astype(x.dtype)
        d_sW = jnp.einsum("tbg,tbh->gh", dgh, _prev_state(h, reverse),
                          preferred_element_type=jnp.float32)
        d_iW = jnp.einsum("tbg,tbd->gd", dgx, x,
                          preferred_element_type=jnp.float32)
        d_b = jnp.sum(dgx, axis=(0, 1), dtype=jnp.float32)
        return (d_x, d_iW.astype(iW.dtype), d_b,
                d_sW.astype(sW.dtype))

    layer_fn.defvjp(fwd, bwd)
    return layer_fn


_gru_layer_fns = {False: _make_gru_layer(False),
                  True: _make_gru_layer(True)}


def gru_layer(x, iW, b, sW, reverse=False):
    """Whole GRU layer: h = gru(x @ iW.T + b; sW), direction `reverse`.
    See lstm_layer."""
    return _gru_layer_fns[bool(reverse)](x, iW, b, sW)
