"""Pinned parity against the reference C kernels' own self-test data.

tests/data/ref_ctc_selftest.npz holds the fixed score matrices embedded in
the reference kernels' built-in test drivers (test_logprob1/test_seq1/
test_seqlen1 at /root/reference/taiyaki/ctc/c_crf_flipflop.c:520-697 and
the cat_mod fixtures at c_cat_mod_flipflop.c:584-616), together with the
cost and gradient the reference kernels compute on them (captured by
compiling those C files with gcc -O3 -mavx2 -fopenmp and calling
crf_flipflop_cost/grad and cat_mod_flipflop_cost/grad via ctypes; the
scores agree with an independent float64 numpy DP to 1e-7).

This closes the one parity gap CPU-only testing left open in round 1:
loss/grad equality on the reference's OWN data, not just on hand-built
examples.

Conventions (taiyaki/ctc/ctc.pyx:116-153):
    cost = -score / nblk,  d(cost)/d(logprob) = -grad_C / nblk.

cat_mod note: the C test driver's modmoveidx/modmovefact arrays are laid
out 6-per-read, but cat_mod_flipflop_cost offsets them 5-per-read
(`modmoveidxs + seqidx[batch] - batch`, c_cat_mod_flipflop.c:319), so the
windows the kernel actually consumed are flat[0:5] and flat[5:10].  Those
windows do not correspond to any mod_cats assignment expressible through
the production index builder (ctc.pyx:287-292 indexes mods by TARGET
position; the fixture's batch-0 window is source-indexed), so the pin is
asserted at the core level (_cat_mod_loss_core) with the exact index
arrays, which is precisely what the C kernel was given.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taiyaki_tpu.ops import flipflop as ff

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data", "ref_ctc_selftest.npz")
NBLK = 7


@pytest.fixture(scope="module")
def data():
    return np.load(FIXTURE)


def test_crf_cost_matches_reference_kernel(data):
    loss = ff.crf_flipflop_loss(
        jnp.asarray(data["crf_logprob"]), jnp.asarray(data["crf_seq"]),
        jnp.asarray(data["crf_seqlen"]), 1.0)
    expected = -data["crf_score"] / NBLK
    np.testing.assert_allclose(np.asarray(loss), expected, atol=1e-6)
    # the two batch elements are identical in this fixture
    assert abs(float(loss[0]) - float(loss[1])) < 1e-7


def test_crf_grad_matches_reference_kernel(data):
    seqs = jnp.asarray(data["crf_seq"])
    seqlens = jnp.asarray(data["crf_seqlen"])

    def f(lp):
        return ff.crf_flipflop_loss(lp, seqs, seqlens, 1.0).sum()

    g = jax.grad(f)(jnp.asarray(data["crf_logprob"]))
    expected = -data["crf_grad"] / NBLK
    np.testing.assert_allclose(np.asarray(g), expected, atol=2e-5)


def _cat_mod_windows(data):
    """The index windows the C kernel consumed (see module docstring)."""
    flat_mm = data["cm_modmoveidx"].ravel()
    flat_mf = data["cm_modmovefact"].ravel()
    mm = np.stack([flat_mm[0:5], flat_mm[5:10]]).astype(np.int32)
    mf = np.stack([flat_mf[0:5], flat_mf[5:10]]).astype(np.float32)
    return jnp.asarray(mm), jnp.asarray(mf)


def test_cat_mod_cost_matches_reference_kernel(data):
    seqs = jnp.asarray(data["cm_seq"])
    seqlens = jnp.asarray(data["cm_seqlen"])
    stay_idx, move_idx = ff.make_seq_indices(seqs, 4)
    mm, mf = _cat_mod_windows(data)
    cost = ff._cat_mod_loss_core(
        jnp.asarray(data["cm_logprob"]), stay_idx, move_idx, mm, mf, seqlens)
    expected = -data["cm_score"] / NBLK
    np.testing.assert_allclose(np.asarray(cost), expected, atol=1e-5)


def test_cat_mod_grad_matches_reference_kernel(data):
    seqs = jnp.asarray(data["cm_seq"])
    seqlens = jnp.asarray(data["cm_seqlen"])
    stay_idx, move_idx = ff.make_seq_indices(seqs, 4)
    mm, mf = _cat_mod_windows(data)

    def f(lp):
        return ff._cat_mod_loss_core(lp, stay_idx, move_idx, mm, mf,
                                     seqlens).sum()

    g = jax.grad(f)(jnp.asarray(data["cm_logprob"]))
    expected = -data["cm_grad"] / NBLK
    np.testing.assert_allclose(np.asarray(g), expected, atol=5e-5)
