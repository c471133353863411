"""Interpret-mode parity of the Pallas logZ kernels against the scan
implementation (value and gradient)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taiyaki_tpu.ops import flipflop, pallas_logz


@pytest.fixture
def scores():
    rng = np.random.default_rng(11)
    # odd T to exercise the identity-block padding
    return jnp.asarray(
        (5.0 * np.tanh(rng.normal(size=(37, 6, 40)))).astype(np.float32))


def _pallas_logz_interpret(scores):
    nblk, nbatch, ntrans = scores.shape
    nbase = flipflop._nbase_from_ntrans(ntrans)
    bt = pallas_logz.DEFAULT_BLOCK_T
    scores_p = flipflop._logz_pad_scores(scores, bt, dtype=jnp.float32)
    _, logz, lattice = pallas_logz.logz_forward(
        scores_p, nbase, block_t=bt, interpret=True)
    return logz + jnp.log(float(nbase)), scores_p, lattice, nbase


def test_logz_forward_matches_scan(scores):
    ref = flipflop.flipflop_logz(scores)
    got, _, _, _ = _pallas_logz_interpret(scores)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_logz_backward_matches_autodiff(scores):
    g = jnp.asarray(
        np.linspace(0.5, 2.0, scores.shape[1]).astype(np.float32))
    ref = jax.grad(
        lambda s: jnp.sum(flipflop.flipflop_logz(s) * g))(scores)
    _, scores_p, lattice, nbase = _pallas_logz_interpret(scores)
    post = pallas_logz.logz_backward_posteriors(
        scores_p, lattice, nbase, block_t=pallas_logz.DEFAULT_BLOCK_T,
        interpret=True)
    got = post[:scores.shape[0], :, :40] * g[None, :, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_posteriors_sum_to_one(scores):
    _, scores_p, lattice, nbase = _pallas_logz_interpret(scores)
    post = pallas_logz.logz_backward_posteriors(
        scores_p, lattice, nbase, block_t=pallas_logz.DEFAULT_BLOCK_T,
        interpret=True)[:scores.shape[0]]
    np.testing.assert_allclose(np.asarray(post).sum(axis=2),
                               1.0, rtol=1e-5)


def test_logz_bf16_streams_close(scores):
    # Production default: bf16 score/lattice/posterior streams, f32
    # arithmetic (flipflop._logz_pallas_fwd/_bwd).
    nblk, nbatch, ntrans = scores.shape
    nbase = flipflop._nbase_from_ntrans(ntrans)
    bt = pallas_logz.DEFAULT_BLOCK_T
    scores_p = flipflop._logz_pad_scores(scores, bt, dtype=jnp.bfloat16)
    _, logz, lattice = pallas_logz.logz_forward(
        scores_p, nbase, block_t=bt, interpret=True,
        residual_dtype=jnp.bfloat16)
    got = logz + jnp.log(float(nbase))
    assert got.dtype == jnp.float32 and lattice.dtype == jnp.bfloat16
    ref = flipflop.flipflop_logz(scores)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=0.05 * nblk)
    post = pallas_logz.logz_backward_posteriors(
        scores_p, lattice, nbase, block_t=bt, interpret=True,
        out_dtype=jnp.bfloat16)
    assert post.dtype == jnp.bfloat16
    g = jnp.asarray(np.linspace(0.5, 2.0, nbatch).astype(np.float32))
    ref_grad = jax.grad(
        lambda s: jnp.sum(flipflop.flipflop_logz(s) * g))(scores)
    got_grad = (post[:nblk, :, :ntrans].astype(jnp.float32)
                * g[None, :, None])
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(ref_grad),
                               atol=0.03)
