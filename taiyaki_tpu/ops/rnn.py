"""Fast recurrent scans with custom VJP.

XLA's autodiff of a `lax.scan` RNN accumulates the weight gradient with a
transposed outer-product matmul *inside every backward step*, which on TPU
runs ~100x slower than the forward scan.  These custom-VJP scans instead:

* keep only elementwise math plus ONE [B,kH]x[kH,H] matmul in the backward
  loop (the hidden-state gradient chain), and
* compute the weight gradients after the loop as a single large
  [T*B, kH]^T x [T*B, H] GEMM over the stacked per-step gate gradients —
  exactly the shape the MXU wants.

Both scans take `reverse=True` to run the recurrence backwards in time
with inputs and outputs in NATURAL time order.  The reference implements
its `Reverse` combinator by flipping the data before and after the inner
layer (taiyaki/layers.py:117-154); flipping a [T,B,H] stream costs two
full HBM passes per flip (four per layer counting the VJP), so here the
kernels walk time in the requested direction instead and no flip is ever
materialized.

Semantics match taiyaki_tpu.layers.Lstm / GruMod (torch cell equations
with the redundant hidden bias pinned to zero); layers.py dispatches here.

Measured on TPU v5e (T=800, B=64, H=256): fwd+bwd 82ms -> ~4ms per layer.
"""

import os

import jax
import jax.numpy as jnp

# Unrolling the time loop amortizes TPU scan-iteration overhead (the
# dominant cost for small recurrent matmuls): measured 54ms -> 39ms per
# full train step at unroll=8 on v5e.
_UNROLL = 8


def _use_pallas():
    """Dispatch the time loops to the fused Pallas kernels on TPU.

    Trace-time constant; disable with TAIYAKI_TPU_NO_PALLAS=1.
    """
    if os.environ.get("TAIYAKI_TPU_NO_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


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


def _make_lstm_scan(reverse):
    @jax.custom_vjp
    def scan_fn(gates_x, sW):
        h, _ = _lstm_fwd_core(gates_x, sW, reverse)
        return h

    def fwd(gates_x, sW):
        if _use_pallas():
            from taiyaki_tpu.ops import pallas_rnn
            T = gates_x.shape[0]
            bt = pallas_rnn.block_t_for(gates_x.shape[1])
            gx = _pad_time(gates_x, bt)
            # residuals stream in bf16 (arithmetic and h stay f32): halves
            # their HBM traffic; gates are recomputed from bf16 pre in bwd
            h, c, pre = pallas_rnn.lstm_fwd(gx, sW, block_t=bt,
                                            residual_dtype=jnp.bfloat16,
                                            reverse=reverse)
            return h[:T], (h[:T], c[:T], pre[:T], sW)
        return _lstm_fwd_core(gates_x, sW, reverse)

    def bwd(res, dh_out):
        # NOTE: _use_pallas() is a trace-time constant, so fwd and bwd
        # agree on the residual structure.
        h, c, pre, sW = res
        T, B, H = h.shape
        h_prev = _prev_state(h, reverse)
        c_prev = _prev_state(c, reverse)
        if _use_pallas():
            from taiyaki_tpu.ops import pallas_rnn
            bt = pallas_rnn.block_t_for(B)
            gdt = _grad_stream_dtype()
            dpre = pallas_rnn.lstm_bwd(
                _pad_time(dh_out.astype(gdt or dh_out.dtype), bt),
                _pad_time(pre, bt),
                _pad_time(c, bt), _pad_time(c_prev, bt), sW,
                block_t=bt, reverse=reverse, grad_dtype=gdt)[:T]
            d_sW = jnp.einsum("tbg,tbh->gh", dpre, h_prev,
                              preferred_element_type=jnp.float32)
            # cotangent dtype must match the primal; XLA fuses the
            # upcast into the consuming GEMMs (no f32 copy in HBM)
            return dpre.astype(dh_out.dtype), d_sW

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
        # Weight gradient as one big GEMM over all steps.
        d_sW = jnp.einsum("tbg,tbh->gh", dpre_all, h_prev,
                          preferred_element_type=jnp.float32)
        return dpre_all, d_sW

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


def _make_gru_scan(reverse):
    @jax.custom_vjp
    def scan_fn(gates_x, sW):
        h, _ = _gru_fwd_core(gates_x, sW, reverse)
        return h

    def fwd(gates_x, sW):
        if _use_pallas():
            from taiyaki_tpu.ops import pallas_rnn
            T = gates_x.shape[0]
            bt = pallas_rnn.block_t_for(gates_x.shape[1])
            gx = _pad_time(gates_x, bt)
            h, gh = pallas_rnn.gru_fwd(gx, sW, block_t=bt,
                                       residual_dtype=jnp.bfloat16,
                                       reverse=reverse)
            # Residuals for the Pallas backward: raw gates + hidden matmuls.
            return h[:T], (h[:T], gates_x, gh[:T], sW)
        return _gru_fwd_core(gates_x, sW, reverse)

    def bwd(res, dh_out):
        if _use_pallas():
            from taiyaki_tpu.ops import pallas_rnn
            h, gates_x, gh, sW = res
            T, B, H = h.shape
            bt = pallas_rnn.block_t_for(B)
            gdt = _grad_stream_dtype()
            h_prev = _prev_state(h, reverse)
            dgx, dgh = pallas_rnn.gru_bwd(
                _pad_time(dh_out.astype(gdt or dh_out.dtype), bt),
                _pad_time(gates_x, bt),
                _pad_time(gh, bt), _pad_time(h_prev, bt), sW,
                block_t=bt, reverse=reverse, grad_dtype=gdt)
            dgx, dgh = dgx[:T], dgh[:T]
            d_sW = jnp.einsum("tbg,tbh->gh", dgh, h_prev,
                              preferred_element_type=jnp.float32)
            return dgx.astype(dh_out.dtype), d_sW
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
        d_sW = jnp.einsum("tbg,tbh->gh", dgh_all, h_prev,
                          preferred_element_type=jnp.float32)
        return dgx_all, d_sW

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
