"""Pallas RNN kernels (interpret mode on CPU) vs the lax.scan reference
implementations in ops/rnn.py."""

import jax
import jax.numpy as jnp
import numpy as np

from taiyaki_tpu.ops import pallas_rnn, rnn


def setup(k, T=32, B=8, H=16, seed=0):
    rng = np.random.default_rng(seed)
    gates_x = jnp.asarray(rng.normal(size=(T, B, k * H)).astype(np.float32))
    sW = jnp.asarray(rng.normal(size=(k * H, H)).astype(np.float32) * 0.3)
    return gates_x, sW


def test_lstm_fwd_matches_scan():
    gates_x, sW = setup(4)
    h_ref, (href2, c_ref, pre_ref, _) = rnn._lstm_fwd_core(gates_x, sW)
    h, c, pre = pallas_rnn.lstm_fwd(gates_x, sW, block_t=8, interpret=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(pre_ref),
                               rtol=1e-5, atol=1e-6)


def test_lstm_bwd_matches_scan():
    gates_x, sW = setup(4)
    T, B, _ = gates_x.shape
    H = sW.shape[1]
    h, c, pre = pallas_rnn.lstm_fwd(gates_x, sW, block_t=8, interpret=True)
    rng = np.random.default_rng(1)
    dh_out = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    c_prev = jnp.concatenate([jnp.zeros((1, B, H)), c[:-1]])
    dpre = pallas_rnn.lstm_bwd(dh_out, pre, c, c_prev, sW, block_t=8,
                               interpret=True)
    # reference: VJP through the lax.scan fallback (dgx == dpre for LSTM)
    _, vjp_fn = jax.vjp(lambda gx: rnn.lstm_scan(gx, sW), gates_x)
    dgx_ref, = vjp_fn(dh_out)
    np.testing.assert_allclose(np.asarray(dpre), np.asarray(dgx_ref),
                               rtol=1e-4, atol=1e-5)


def test_lstm_bwd_fused_dx_matches_einsum():
    gates_x, sW = setup(4)
    T, B, _ = gates_x.shape
    H = sW.shape[1]
    D = 12
    rng = np.random.default_rng(2)
    iW = jnp.asarray(rng.normal(size=(4 * H, D)).astype(np.float32) * 0.3)
    h, c, pre = pallas_rnn.lstm_fwd(gates_x, sW, block_t=8, interpret=True)
    dh_out = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    c_prev = jnp.concatenate([jnp.zeros((1, B, H)), c[:-1]])
    dpre_plain = pallas_rnn.lstm_bwd(dh_out, pre, c, c_prev, sW, block_t=8,
                                     interpret=True)
    dpre, dx = pallas_rnn.lstm_bwd(dh_out, pre, c, c_prev, sW, block_t=8,
                                   interpret=True, iW=iW)
    np.testing.assert_allclose(np.asarray(dpre), np.asarray(dpre_plain),
                               rtol=1e-6, atol=1e-7)
    dx_ref = jnp.einsum("tbg,gd->tbd", dpre_plain, iW)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-5)


def test_lstm_unrolled_block_matches_rolled():
    """The statically-unrolled branch (what production block_t<=2 takes)
    must match the rolled fori_loop bit for bit, fwd and bwd, in the
    bf16-stream configuration the bs>=256 training step uses."""
    gates_x, sW = setup(4)
    T, B, _ = gates_x.shape
    H = sW.shape[1]
    rng = np.random.default_rng(7)
    iW = jnp.asarray(rng.normal(size=(4 * H, 8)).astype(np.float32) * 0.3)
    kw = dict(block_t=2, interpret=True, residual_dtype=jnp.bfloat16)
    h1, c1, p1 = pallas_rnn.lstm_fwd(gates_x, sW, **kw)
    h2, c2, p2 = pallas_rnn.lstm_fwd(gates_x, sW, unroll=True, **kw)
    for a, b in [(h1, h2), (c1, c2), (p1, p2)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    cp = jnp.concatenate([jnp.zeros((1, B, H), c1.dtype), c1[:-1]])
    bkw = dict(block_t=2, interpret=True, grad_dtype=jnp.bfloat16, iW=iW)
    d1, x1 = pallas_rnn.lstm_bwd(dh, p1, c1, cp, sW, **bkw)
    d2, x2 = pallas_rnn.lstm_bwd(dh, p1, c1, cp, sW, unroll=True, **bkw)
    # interpret mode compiles rolled vs unrolled loops through different
    # XLA-CPU fusions, so values landing on bf16 rounding boundaries can
    # store one ulp apart (~3e-5 here); the real-TPU A/B is bit-identical
    np.testing.assert_allclose(np.asarray(d1.astype(jnp.float32)),
                               np.asarray(d2.astype(jnp.float32)),
                               atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                               atol=1e-4, rtol=0)


def test_unroll_guard_ignores_unsafe_block():
    """unroll=True at block_t > MAX_UNROLL_BLOCK_T must take the ROLLED
    fori_loop (unrolled big blocks hang the Mosaic compile); observe the
    path taken by whether the body receives concrete Python ints
    (static unroll) or a single traced index (fori_loop)."""
    from taiyaki_tpu.ops import pallas_common

    def record(block_t, unroll):
        seen = []

        def body(j, _):
            seen.append(j)
            return 0

        pallas_common.run_steps(body, block_t, unroll)
        return seen

    # safe: statically unrolled -> one concrete int per iteration
    seen = record(2, True)
    assert seen == [0, 1]
    # unsafe: guard forces the rolled loop -> body traced with a tracer
    seen = record(8, True)
    assert not any(isinstance(j, int) for j in seen), seen
    # unroll=False always rolls
    seen = record(2, False)
    assert not any(isinstance(j, int) for j in seen), seen


def test_gru_bwd_fused_dx_matches_einsum():
    gates_x, sW = setup(3)
    T, B, _ = gates_x.shape
    H = sW.shape[1]
    D = 12
    rng = np.random.default_rng(3)
    iW = jnp.asarray(rng.normal(size=(3 * H, D)).astype(np.float32) * 0.3)
    h, gh = pallas_rnn.gru_fwd(gates_x, sW, block_t=8, interpret=True)
    dh_out = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    h_prev = jnp.concatenate([jnp.zeros((1, B, H)), h[:-1]])
    dgx_p, dgh_p = pallas_rnn.gru_bwd(dh_out, gates_x, gh, h_prev, sW,
                                      block_t=8, interpret=True)
    dgx, dgh, dx = pallas_rnn.gru_bwd(dh_out, gates_x, gh, h_prev, sW,
                                      block_t=8, interpret=True, iW=iW)
    np.testing.assert_allclose(np.asarray(dgx), np.asarray(dgx_p),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dgh), np.asarray(dgh_p),
                               rtol=1e-6, atol=1e-7)
    dx_ref = jnp.einsum("tbg,gd->tbd", dgx_p, iW)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-5)


def test_gru_fwd_matches_scan():
    gates_x, sW = setup(3)
    h_ref, (h2, r, z, n, ghn, _) = rnn._gru_fwd_core(gates_x, sW)
    h, gh = pallas_rnn.gru_fwd(gates_x, sW, block_t=8, interpret=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gh[:, :, 2 * 16:]),
                               np.asarray(ghn), rtol=1e-5, atol=1e-6)


def test_gru_bwd_matches_scan():
    gates_x, sW = setup(3)
    T, B, _ = gates_x.shape
    H = sW.shape[1]
    h, gh = pallas_rnn.gru_fwd(gates_x, sW, block_t=8, interpret=True)
    rng = np.random.default_rng(2)
    dh_out = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    h_prev = jnp.concatenate([jnp.zeros((1, B, H)), h[:-1]])
    dgx, dgh = pallas_rnn.gru_bwd(dh_out, gates_x, gh, h_prev, sW,
                                  block_t=8, interpret=True)
    _, vjp_fn = jax.vjp(lambda gx, s: rnn.gru_scan(gx, s), gates_x, sW)
    dgx_ref, d_sW_ref = vjp_fn(dh_out)
    np.testing.assert_allclose(np.asarray(dgx), np.asarray(dgx_ref),
                               rtol=1e-4, atol=1e-5)
    d_sW = jnp.einsum("tbg,tbh->gh", dgh, h_prev)
    np.testing.assert_allclose(np.asarray(d_sW), np.asarray(d_sW_ref),
                               rtol=1e-4, atol=1e-4)


def test_lstm_reverse_matches_flip():
    # reversed-traversal kernel == flip -> natural kernel -> flip
    gates_x, sW = setup(4)
    h_r, c_r, pre_r = pallas_rnn.lstm_fwd(gates_x, sW, block_t=8,
                                          interpret=True, reverse=True)
    flip = lambda a: jnp.flip(a, axis=0)
    h_f, c_f, pre_f = pallas_rnn.lstm_fwd(flip(gates_x), sW, block_t=8,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(h_r), np.asarray(flip(h_f)),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c_r), np.asarray(flip(c_f)),
                               rtol=1e-6, atol=1e-7)
    # backward of the reversed layer walks ascending time
    T, B, _ = gates_x.shape
    H = sW.shape[1]
    rng = np.random.default_rng(4)
    dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    c_prev_r = jnp.concatenate([c_r[1:], jnp.zeros((1, B, H))])
    dpre_r = pallas_rnn.lstm_bwd(dh, pre_r, c_r, c_prev_r, sW, block_t=8,
                                 interpret=True, reverse=True)
    c_prev_f = jnp.concatenate([jnp.zeros((1, B, H)), c_f[:-1]])
    dpre_f = pallas_rnn.lstm_bwd(flip(dh), pre_f, c_f, c_prev_f, sW,
                                 block_t=8, interpret=True)
    np.testing.assert_allclose(np.asarray(dpre_r), np.asarray(flip(dpre_f)),
                               rtol=1e-5, atol=1e-6)


def test_gru_reverse_matches_flip():
    gates_x, sW = setup(3)
    h_r, gh_r = pallas_rnn.gru_fwd(gates_x, sW, block_t=8,
                                   interpret=True, reverse=True)
    flip = lambda a: jnp.flip(a, axis=0)
    h_f, gh_f = pallas_rnn.gru_fwd(flip(gates_x), sW, block_t=8,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(h_r), np.asarray(flip(h_f)),
                               rtol=1e-6, atol=1e-7)
    T, B, _ = gates_x.shape
    H = sW.shape[1]
    rng = np.random.default_rng(5)
    dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    h_prev_r = jnp.concatenate([h_r[1:], jnp.zeros((1, B, H))])
    dgx_r, dgh_r = pallas_rnn.gru_bwd(dh, gates_x, gh_r, h_prev_r, sW,
                                      block_t=8, interpret=True,
                                      reverse=True)
    h_prev_f = jnp.concatenate([jnp.zeros((1, B, H)), h_f[:-1]])
    dgx_f, dgh_f = pallas_rnn.gru_bwd(flip(dh), flip(gates_x), gh_f,
                                      h_prev_f, sW, block_t=8,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(dgx_r), np.asarray(flip(dgx_f)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dgh_r), np.asarray(flip(dgh_f)),
                               rtol=1e-5, atol=1e-6)


def test_lstm_fused_fwd_matches_unfused():
    # in-kernel gate GEMM == XLA GEMM + plain kernel, incl. tail masking
    rng = np.random.default_rng(7)
    T, B, D, H = 27, 8, 12, 16   # T NOT a multiple of block_t
    x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
    iW = jnp.asarray(rng.normal(size=(4 * H, D)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32))
    sW = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * 0.3)
    xp = rnn._pad_time(x, 8)
    for reverse in (False, True):
        h_f, c_f, pre_f = pallas_rnn.lstm_fused_fwd(
            xp, iW, b, sW, block_t=8, interpret=True, reverse=reverse,
            true_len=T)
        gates = xp @ iW.T + b
        # zero-pad rows must behave as gx=0 for the reference kernel
        gates = gates.at[T:].set(0.0)
        h_u, c_u, pre_u = pallas_rnn.lstm_fwd(gates, sW, block_t=8,
                                              interpret=True,
                                              reverse=reverse)
        np.testing.assert_allclose(np.asarray(h_f[:T]), np.asarray(h_u[:T]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pre_f[:T]),
                                   np.asarray(pre_u[:T]),
                                   rtol=1e-5, atol=1e-6)


def test_gru_fused_fwd_matches_unfused():
    rng = np.random.default_rng(8)
    T, B, D, H = 27, 8, 12, 16
    x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
    iW = jnp.asarray(rng.normal(size=(3 * H, D)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32))
    sW = jnp.asarray(rng.normal(size=(3 * H, H)).astype(np.float32) * 0.3)
    xp = rnn._pad_time(x, 8)
    for reverse in (False, True):
        h_f, gh_f, gx_f = pallas_rnn.gru_fused_fwd(
            xp, iW, b, sW, block_t=8, interpret=True, reverse=reverse,
            true_len=T)
        gates = (xp @ iW.T + b).at[T:].set(0.0)
        h_u, gh_u = pallas_rnn.gru_fwd(gates, sW, block_t=8,
                                       interpret=True, reverse=reverse)
        np.testing.assert_allclose(np.asarray(h_f[:T]), np.asarray(h_u[:T]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gx_f[:T]),
                                   np.asarray(gates[:T]),
                                   rtol=1e-5, atol=1e-6)


def test_block_t_scales_down_with_batch():
    # The RNN kernels tile the batch axis across the grid, so block_t is
    # constant and the batch tile divides the batch (VMEM per grid step
    # is bounded by block_t * block_b regardless of total batch).
    from taiyaki_tpu.ops import pallas_crf
    assert pallas_rnn.block_t_for(64) == 8
    assert pallas_rnn.block_t_for(128) == 4      # pre-tiling tuning kept
    assert pallas_rnn.block_t_for(256) == 2
    assert pallas_rnn.block_t_for(512) == 2      # 2 tiles of 256
    assert pallas_rnn.block_b_for(64) == 64
    assert pallas_rnn.block_b_for(256) == 256
    assert pallas_rnn.block_b_for(512) == 256
    assert pallas_rnn.block_b_for(8) == 8
    assert pallas_rnn.block_b_for(24) == 8
    assert pallas_rnn.block_b_for(96) == 32
    for b in (8, 16, 24, 64, 96, 128, 256, 512, 1024):
        assert b % pallas_rnn.block_b_for(b) == 0
    # CRF kernels: 64-row batch tiles, so block_t is flat at its tuned
    # value once the tile is the full 64 rows
    assert pallas_crf.fwd_block_t(64) == 8
    assert pallas_crf.fwd_block_t(128) == 4    # pre-tiling tuning kept
    assert pallas_crf.fwd_block_t(256) == 2
    assert pallas_crf.fwd_block_t(1024) == 2   # 4 tiles of 256
    assert pallas_crf.bwd_block_t(64) == 4
    assert pallas_crf.bwd_block_t(1024) == 1
    assert pallas_crf.block_b_for(1024) == 256
    assert pallas_crf.block_b_for(96) == 32
    assert pallas_crf.block_b_for(6) == 6   # odd batches: single tile
    # backward block always divides the forward padding
    for b in (6, 8, 16, 64, 96, 128, 256, 512, 1024):
        assert pallas_crf.fwd_block_t(b) % pallas_crf.bwd_block_t(b) == 0
        assert b % pallas_crf.block_b_for(b) == 0


def test_lstm_bf16_grad_stream_close():
    # bf16 storage of the dpre gradient stream must stay close to f32
    gates_x, sW = setup(4)
    T, B, _ = gates_x.shape
    H = sW.shape[1]
    h, c, pre = pallas_rnn.lstm_fwd(gates_x, sW, block_t=8, interpret=True)
    rng = np.random.default_rng(6)
    dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    c_prev = jnp.concatenate([jnp.zeros((1, B, H)), c[:-1]])
    d32 = pallas_rnn.lstm_bwd(dh, pre, c, c_prev, sW, block_t=8,
                              interpret=True)
    d16 = pallas_rnn.lstm_bwd(dh.astype(jnp.bfloat16), pre, c, c_prev, sW,
                              block_t=8, interpret=True,
                              grad_dtype=jnp.bfloat16)
    assert d16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(d16, np.float32),
                               np.asarray(d32), rtol=0.1, atol=0.02)


def test_lstm_bf16_residuals_close():
    # bf16 residual storage (c, pre) must keep gradients close to f32
    gates_x, sW = setup(4)
    T, B, _ = gates_x.shape
    H = sW.shape[1]
    h32, c32, pre32 = pallas_rnn.lstm_fwd(gates_x, sW, block_t=8,
                                          interpret=True)
    h16, c16, pre16 = pallas_rnn.lstm_fwd(
        gates_x, sW, block_t=8, interpret=True,
        residual_dtype=jnp.bfloat16)
    # h is unaffected by residual storage
    np.testing.assert_array_equal(np.asarray(h16), np.asarray(h32))
    rng = np.random.default_rng(3)
    dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
    cp32 = jnp.concatenate([jnp.zeros((1, B, H), c32.dtype), c32[:-1]])
    cp16 = jnp.concatenate([jnp.zeros((1, B, H), c16.dtype), c16[:-1]])
    d32 = pallas_rnn.lstm_bwd(dh, pre32, c32, cp32, sW, block_t=8,
                              interpret=True)
    d16 = pallas_rnn.lstm_bwd(dh, pre16, c16, cp16, sW, block_t=8,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(d16), np.asarray(d32),
                               rtol=0.1, atol=0.02)


def test_batch_tiled_grid_matches_scan():
    """B=24 runs as 3 batch tiles of 8 (batch-tile outer grid dim); every
    tile must reset its carry and produce exactly the single-tile result,
    in both time directions, fwd and bwd."""
    for reverse in (False, True):
        gates_x, sW = setup(3, B=24, seed=11)
        T, B, _ = gates_x.shape
        H = sW.shape[1]
        assert pallas_rnn.block_b_for(B) == 8 and B // 8 == 3
        h_ref, _ = rnn._gru_fwd_core(gates_x, sW, reverse)
        h, gh = pallas_rnn.gru_fwd(gates_x, sW, block_t=8, interpret=True,
                                   reverse=reverse)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                   rtol=1e-5, atol=1e-6)
        rng = np.random.default_rng(12)
        dh_out = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))
        h_prev = rnn._prev_state(h, reverse)
        dgx, dgh = pallas_rnn.gru_bwd(dh_out, gates_x, gh, h_prev, sW,
                                      block_t=8, interpret=True,
                                      reverse=reverse)
        _, vjp_fn = jax.vjp(
            lambda gx: rnn._gru_scan_fns[reverse](gx, sW), gates_x)
        dgx_ref, = vjp_fn(dh_out)
        np.testing.assert_allclose(np.asarray(dgx), np.asarray(dgx_ref),
                                   rtol=1e-4, atol=1e-5)

        gx4, sW4 = setup(4, B=24, seed=13)
        h_ref4, _ = rnn._lstm_fwd_core(gx4, sW4, reverse)
        h4, c4, pre4 = pallas_rnn.lstm_fwd(gx4, sW4, block_t=8,
                                           interpret=True, reverse=reverse)
        np.testing.assert_allclose(np.asarray(h4), np.asarray(h_ref4),
                                   rtol=1e-5, atol=1e-6)


def test_lstm_bwd_fusedw_matches_vjp():
    """The fused-weight-gradient backward must reproduce the lax.scan
    VJP's (d_x, d_iW, d_b, d_sW) — both time directions, multi-tile
    batch (B=24 -> 3 tiles of 8), and with zero time padding in play."""
    for reverse in (False, True):
        rng = np.random.default_rng(21)
        T, B, H, D = 19, 24, 16, 12   # T=19 pads to 24 with block_t=8
        x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
        iW = jnp.asarray(rng.normal(size=(4 * H, D)).astype(np.float32) * .3)
        b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * .3)
        sW = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * .3)
        dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

        def ref_fn(x, iW, b, sW):
            return rnn._lstm_fwd_core(x @ iW.T + b, sW, reverse)[0]

        h_ref, vjp = jax.vjp(ref_fn, x, iW, b, sW)
        dx_ref, diw_ref, db_ref, dsw_ref = vjp(dh)

        h, (_, c, pre, _) = rnn._lstm_fwd_core(x @ iW.T + b, sW, reverse)
        c_prev = rnn._prev_state(c, reverse)

        def pad(a):
            return rnn._pad_time(a, 8)

        dx, dsw, diw, db = pallas_rnn.lstm_bwd_fusedw(
            pad(dh), pad(pre), pad(c), pad(c_prev), pad(h), pad(x),
            sW, iW, block_t=8, reverse=reverse, true_len=T,
            interpret=True)
        np.testing.assert_allclose(np.asarray(dx[:T]), np.asarray(dx_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dsw.sum(0)),
                                   np.asarray(dsw_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(diw.sum(0)),
                                   np.asarray(diw_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(db.sum(0)),
                                   np.asarray(db_ref),
                                   rtol=1e-4, atol=1e-4)


def test_gru_bwd_fusedw_matches_vjp():
    """GRU fused-weight-gradient backward vs the lax.scan VJP — both
    directions, multi-tile batch, time padding active."""
    for reverse in (False, True):
        rng = np.random.default_rng(33)
        T, B, H, D = 19, 24, 16, 12
        x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
        iW = jnp.asarray(rng.normal(size=(3 * H, D)).astype(np.float32) * .3)
        b = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32) * .3)
        sW = jnp.asarray(rng.normal(size=(3 * H, H)).astype(np.float32) * .3)
        dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

        def ref_fn(x, iW, b, sW):
            return rnn._gru_fwd_core(x @ iW.T + b, sW, reverse)[0]

        _, vjp = jax.vjp(ref_fn, x, iW, b, sW)
        dx_ref, diw_ref, db_ref, dsw_ref = vjp(dh)

        gates_x = x @ iW.T + b
        h, _ = rnn._gru_fwd_core(gates_x, sW, reverse)
        # gh as the fused fwd would store it
        gh = jnp.einsum("tbh,gh->tbg", rnn._prev_state(h, reverse), sW)
        h_prev = rnn._prev_state(h, reverse)

        def pad(a):
            return rnn._pad_time(a, 8)

        dx, dsw, diw, db = pallas_rnn.gru_bwd_fusedw(
            pad(dh), pad(gates_x), pad(gh), pad(h_prev), pad(x),
            sW, iW, block_t=8, reverse=reverse, true_len=T,
            interpret=True)
        np.testing.assert_allclose(np.asarray(dx[:T]), np.asarray(dx_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dsw.sum(0)),
                                   np.asarray(dsw_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(diw.sum(0)),
                                   np.asarray(diw_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(db.sum(0)),
                                   np.asarray(db_ref),
                                   rtol=1e-4, atol=1e-4)


def test_lstm_bwd_recompute_matches_vjp():
    """The pre-recomputing backward (no stored pre residual; c and h
    streamed twice with block-shifted maps) must reproduce the lax.scan
    VJP — both directions, multi-tile batch, time padding active."""
    for reverse in (False, True):
        rng = np.random.default_rng(55)
        T, B, H, D = 19, 24, 16, 12
        x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
        iW = jnp.asarray(rng.normal(size=(4 * H, D)).astype(np.float32) * .3)
        b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * .3)
        sW = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * .3)
        dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

        def ref_fn(x, iW, b, sW):
            return rnn._lstm_fwd_core(x @ iW.T + b, sW, reverse)[0]

        _, vjp = jax.vjp(ref_fn, x, iW, b, sW)
        dx_ref, diw_ref, db_ref, dsw_ref = vjp(dh)

        h, (_, c, pre, _) = rnn._lstm_fwd_core(x @ iW.T + b, sW, reverse)

        def pad(a):
            return rnn._pad_time(a, 8)

        dx, dsw, diw, db = pallas_rnn.lstm_bwd_recompute(
            pad(dh), pad(c), pad(h), pad(x), sW, iW, b,
            block_t=8, reverse=reverse, true_len=T, interpret=True)
        np.testing.assert_allclose(np.asarray(dx[:T]), np.asarray(dx_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dsw.sum(0)),
                                   np.asarray(dsw_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(diw.sum(0)),
                                   np.asarray(diw_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(db.sum(0)),
                                   np.asarray(db_ref),
                                   rtol=1e-4, atol=1e-4)


def test_gru_bwd_recompute_matches_vjp():
    """The gate-recomputing GRU backward (no stored gx/gh residuals; h
    streamed twice with a block-shifted map) must reproduce the lax.scan
    VJP — both directions, multi-tile batch, time padding active."""
    for reverse in (False, True):
        rng = np.random.default_rng(56)
        T, B, H, D = 19, 24, 16, 12
        x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
        iW = jnp.asarray(rng.normal(size=(3 * H, D)).astype(np.float32) * .3)
        b = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32) * .3)
        sW = jnp.asarray(rng.normal(size=(3 * H, H)).astype(np.float32) * .3)
        dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

        def ref_fn(x, iW, b, sW):
            return rnn._gru_fwd_core(x @ iW.T + b, sW, reverse)[0]

        _, vjp = jax.vjp(ref_fn, x, iW, b, sW)
        dx_ref, diw_ref, db_ref, dsw_ref = vjp(dh)

        h, _ = rnn._gru_fwd_core(x @ iW.T + b, sW, reverse)

        def pad(a):
            return rnn._pad_time(a, 8)

        dx, dsw, diw, db = pallas_rnn.gru_bwd_recompute(
            pad(dh), pad(h), pad(x), sW, iW, b,
            block_t=8, reverse=reverse, true_len=T, interpret=True)
        np.testing.assert_allclose(np.asarray(dx[:T]), np.asarray(dx_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dsw.sum(0)),
                                   np.asarray(dsw_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(diw.sum(0)),
                                   np.asarray(diw_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(db.sum(0)),
                                   np.asarray(db_ref),
                                   rtol=1e-4, atol=1e-4)


def test_gru_fused_fwd_no_residuals_matches():
    """emit_residuals=False must produce the same h as the full-output
    kernel (inference + recompute-backward path)."""
    rng = np.random.default_rng(57)
    T, B, H, D = 16, 16, 12, 8
    x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
    iW = jnp.asarray(rng.normal(size=(3 * H, D)).astype(np.float32) * .3)
    b = jnp.asarray(rng.normal(size=(3 * H,)).astype(np.float32) * .3)
    sW = jnp.asarray(rng.normal(size=(3 * H, H)).astype(np.float32) * .3)
    for reverse in (False, True):
        full = pallas_rnn.gru_fused_fwd(x, iW, b, sW, block_t=8,
                                        reverse=reverse, interpret=True)
        bare = pallas_rnn.gru_fused_fwd(x, iW, b, sW, block_t=8,
                                        reverse=reverse, interpret=True,
                                        emit_residuals=False)
        assert len(bare) == 1
        np.testing.assert_array_equal(np.asarray(full[0]),
                                      np.asarray(bare[0]))


def test_lstm_bwd_acts_matches_vjp():
    """The transcendental-free backward (stored post-activation gates +
    tanh(c)) must reproduce the lax.scan VJP — both directions,
    multi-tile batch, time padding active."""
    for reverse in (False, True):
        rng = np.random.default_rng(58)
        T, B, H, D = 19, 24, 16, 12
        x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
        iW = jnp.asarray(rng.normal(size=(4 * H, D)).astype(np.float32) * .3)
        b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * .3)
        sW = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * .3)
        dh = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

        def ref_fn(x, iW, b, sW):
            return rnn._lstm_fwd_core(x @ iW.T + b, sW, reverse)[0]

        _, vjp = jax.vjp(ref_fn, x, iW, b, sW)
        dx_ref, diw_ref, db_ref, dsw_ref = vjp(dh)

        h, (_, c, pre, _) = rnn._lstm_fwd_core(x @ iW.T + b, sW, reverse)
        i = jax.nn.sigmoid(pre[:, :, :H])
        f = jax.nn.sigmoid(pre[:, :, H:2 * H])
        g = jnp.tanh(pre[:, :, 2 * H:3 * H])
        o = jax.nn.sigmoid(pre[:, :, 3 * H:])
        acts = jnp.concatenate([i, f, g, o], axis=2)
        tc = jnp.tanh(c)
        c_prev = rnn._prev_state(c, reverse)

        def pad(a):
            return rnn._pad_time(a, 8)

        dx, dsw, diw, db = pallas_rnn.lstm_bwd_acts(
            pad(dh), pad(acts), pad(tc), pad(c_prev), pad(h), pad(x),
            sW, iW, block_t=8, reverse=reverse, true_len=T,
            interpret=True)
        np.testing.assert_allclose(np.asarray(dx[:T]), np.asarray(dx_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dsw.sum(0)),
                                   np.asarray(dsw_ref), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(diw.sum(0)),
                                   np.asarray(diw_ref), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(db.sum(0)),
                                   np.asarray(db_ref), rtol=1e-4,
                                   atol=1e-4)


def test_lstm_fused_fwd_emit_acts_consistent():
    """emit='acts' must return the same h/c as emit='pre', with acts =
    the gate nonlinearities of pre and tc = tanh(c)."""
    rng = np.random.default_rng(59)
    T, B, H, D = 16, 16, 12, 8
    x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
    iW = jnp.asarray(rng.normal(size=(4 * H, D)).astype(np.float32) * .3)
    b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * .3)
    sW = jnp.asarray(rng.normal(size=(4 * H, H)).astype(np.float32) * .3)
    h1, c1, pre = pallas_rnn.lstm_fused_fwd(x, iW, b, sW, block_t=8,
                                            interpret=True)
    h2, c2, acts, tc = pallas_rnn.lstm_fused_fwd(x, iW, b, sW, block_t=8,
                                                 emit="acts",
                                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(
        np.asarray(acts[:, :, :H]),
        np.asarray(jax.nn.sigmoid(pre[:, :, :H])), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc),
                               np.asarray(jnp.tanh(c1)), rtol=1e-6,
                               atol=1e-6)
