"""Custom-VJP RNN scans must produce gradients identical to plain autodiff
through the naive scan."""

import jax
import jax.numpy as jnp
import numpy as np

from taiyaki_tpu.ops import rnn


def naive_lstm(gates_x, sW):
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
        return (h2, c2), h2

    _, h = jax.lax.scan(step, (h0, h0), gates_x)
    return h


def naive_gru(gates_x, sW):
    T, B, H3 = gates_x.shape
    H = H3 // 3
    h0 = jnp.zeros((B, H), gates_x.dtype)

    def step(h, gx):
        gh = h @ sW.T
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        h2 = (1.0 - z) * n + z * h
        return h2, h2

    _, h = jax.lax.scan(step, h0, gates_x)
    return h


def check(fast_fn, naive_fn, k, reverse=False):
    if reverse:
        inner_fast, inner_naive = fast_fn, naive_fn
        fast_fn = lambda gx, s: inner_fast(gx, s, reverse=True)
        naive_fn = lambda gx, s: jnp.flip(
            inner_naive(jnp.flip(gx, axis=0), s), axis=0)
    rng = np.random.default_rng(0)
    T, B, H = 7, 3, 5
    gates_x = jnp.asarray(rng.normal(size=(T, B, k * H)).astype(np.float32))
    sW = jnp.asarray(rng.normal(size=(k * H, H)).astype(np.float32) * 0.3)
    # forward equality
    np.testing.assert_allclose(np.asarray(fast_fn(gates_x, sW)),
                               np.asarray(naive_fn(gates_x, sW)),
                               rtol=1e-5, atol=1e-6)
    # weighted-sum gradient equality (nontrivial cotangent)
    w = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

    def loss_fast(gx, s):
        return jnp.sum(fast_fn(gx, s) * w)

    def loss_naive(gx, s):
        return jnp.sum(naive_fn(gx, s) * w)

    g1 = jax.grad(loss_fast, argnums=(0, 1))(gates_x, sW)
    g2 = jax.grad(loss_naive, argnums=(0, 1))(gates_x, sW)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-5)


def test_lstm_scan_matches_autodiff():
    check(rnn.lstm_scan, naive_lstm, 4)


def test_gru_scan_matches_autodiff():
    check(rnn.gru_scan, naive_gru, 3)


def test_lstm_scan_reverse_matches_flipped_autodiff():
    # reverse=True == flip -> natural scan -> flip, including gradients
    check(rnn.lstm_scan, naive_lstm, 4, reverse=True)


def test_gru_scan_reverse_matches_flipped_autodiff():
    check(rnn.gru_scan, naive_gru, 3, reverse=True)


def check_layer(layer_fn, naive_fn, k, reverse):
    """Layer-level op (x, iW, b, sW) vs autodiff through GEMM + naive."""
    rng = np.random.default_rng(1)
    T, B, D, H = 7, 3, 4, 5
    x = jnp.asarray(rng.normal(size=(T, B, D)).astype(np.float32))
    iW = jnp.asarray(rng.normal(size=(k * H, D)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(k * H,)).astype(np.float32) * 0.3)
    sW = jnp.asarray(rng.normal(size=(k * H, H)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(T, B, H)).astype(np.float32))

    def loss_fast(x, iW, b, sW):
        return jnp.sum(layer_fn(x, iW, b, sW, reverse=reverse) * w)

    def loss_naive(x, iW, b, sW):
        y = naive_fn(jnp.flip(x, 0) if reverse else x, iW, b, sW)
        return jnp.sum((jnp.flip(y, 0) if reverse else y) * w)

    y_naive = naive_fn(jnp.flip(x, 0) if reverse else x, iW, b, sW)
    if reverse:
        y_naive = jnp.flip(y_naive, 0)
    np.testing.assert_allclose(
        np.asarray(layer_fn(x, iW, b, sW, reverse=reverse)),
        np.asarray(y_naive), rtol=1e-5, atol=1e-6)
    g1 = jax.grad(loss_fast, argnums=(0, 1, 2, 3))(x, iW, b, sW)
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2, 3))(x, iW, b, sW)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def naive_lstm_layer(x, iW, b, sW):
    return naive_lstm(x @ iW.T + b, sW)


def naive_gru_layer(x, iW, b, sW):
    return naive_gru(x @ iW.T + b, sW)


def test_lstm_layer_matches_autodiff():
    for reverse in (False, True):
        check_layer(rnn.lstm_layer, naive_lstm_layer, 4, reverse)


def test_gru_layer_matches_autodiff():
    for reverse in (False, True):
        check_layer(rnn.gru_layer, naive_gru_layer, 3, reverse)
