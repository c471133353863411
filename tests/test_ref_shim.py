"""Pin the pure-torch `taiyaki.ctc` shim (misc/ref_headtohead/ctc_shim.py)
used to run the reference trainer for the training head-to-head.

The shim must reproduce the reference C kernels' cost and gradient exactly
(same self-test fixture as tests/test_reference_kernel_parity.py, captured
from /root/reference/taiyaki/ctc/c_crf_flipflop.c:520-697), and agree with
this repo's own pinned JAX loss on production-shaped cat_mod examples and at
sharpfact != 1.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM_DIR = os.path.join(REPO, "misc", "ref_headtohead")
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data", "ref_ctc_selftest.npz")
NBLK = 7

# The shim imports `taiyaki.flipflopfings` from the reference tree.
if not os.path.isdir("/root/reference/taiyaki"):
    pytest.skip("reference tree not present", allow_module_level=True)
for p in (SHIM_DIR, "/root/reference"):
    if p not in sys.path:
        sys.path.insert(0, p)

import ctc_shim  # noqa: E402


@pytest.fixture(scope="module")
def data():
    return np.load(FIXTURE)


def _flat_seqs(seq2d, seqlens):
    return np.concatenate(
        [seq2d[b, : seqlens[b]] for b in range(seq2d.shape[0])])


def test_shim_crf_cost_matches_reference_kernel(data):
    lp = torch.from_numpy(data["crf_logprob"])
    seqs = torch.from_numpy(_flat_seqs(data["crf_seq"], data["crf_seqlen"]))
    seqlens = torch.from_numpy(data["crf_seqlen"].astype(np.int64))
    loss = ctc_shim.crf_flipflop_loss(lp, seqs, seqlens, 1.0)
    expected = -data["crf_score"] / NBLK
    np.testing.assert_allclose(loss.detach().numpy(), expected, atol=1e-6)


def test_shim_crf_grad_matches_reference_kernel(data):
    lp = torch.from_numpy(data["crf_logprob"]).requires_grad_(True)
    seqs = torch.from_numpy(_flat_seqs(data["crf_seq"], data["crf_seqlen"]))
    seqlens = torch.from_numpy(data["crf_seqlen"].astype(np.int64))
    ctc_shim.crf_flipflop_loss(lp, seqs, seqlens, 1.0).sum().backward()
    expected = -data["crf_grad"] / NBLK
    np.testing.assert_allclose(lp.grad.numpy(), expected, atol=2e-5)


@pytest.mark.parametrize("sharpfact", [1.0, 1.3])
def test_shim_crf_matches_jax_loss(data, sharpfact):
    """Cross-pin value AND grad against this repo's pinned JAX loss."""
    import jax
    import jax.numpy as jnp
    from taiyaki_tpu.ops import flipflop as ff

    lp_np = data["crf_logprob"]
    seq2d = jnp.asarray(data["crf_seq"])
    seqlens_j = jnp.asarray(data["crf_seqlen"])

    jl = ff.crf_flipflop_loss(jnp.asarray(lp_np), seq2d, seqlens_j, sharpfact)
    jg = jax.grad(lambda x: ff.crf_flipflop_loss(
        x, seq2d, seqlens_j, sharpfact).sum())(jnp.asarray(lp_np))

    lp = torch.from_numpy(lp_np).requires_grad_(True)
    seqs = torch.from_numpy(_flat_seqs(data["crf_seq"], data["crf_seqlen"]))
    seqlens = torch.from_numpy(data["crf_seqlen"].astype(np.int64))
    tl = ctc_shim.crf_flipflop_loss(lp, seqs, seqlens, sharpfact)
    tl.sum().backward()

    np.testing.assert_allclose(tl.detach().numpy(), np.asarray(jl), atol=1e-5)
    np.testing.assert_allclose(lp.grad.numpy(), np.asarray(jg), atol=2e-5)


@pytest.mark.parametrize("sharpfact", [1.0, 1.2])
def test_shim_cat_mod_matches_jax_loss(sharpfact):
    """Production-shaped cat_mod example vs the pinned JAX implementation.

    The JAX loss takes padded 2-D seqs/mod_cats; the shim takes the
    reference trainer's flat concatenation.  Alphabet: 4 canonical bases,
    one mod for base 0 (can_mods_offsets=[0,2,3,4,5], 45 output columns).
    """
    import jax
    import jax.numpy as jnp
    from taiyaki_tpu.ops import flipflop as ff

    rng = np.random.RandomState(7)
    nblk, nbatch, nstate = 9, 3, 45
    lens = np.array([6, 4, 5], dtype=np.int64)
    maxlen = int(lens.max())
    lp_np = rng.randn(nblk, nbatch, nstate).astype(np.float32)
    seq2d = np.zeros((nbatch, maxlen), dtype=np.int32)
    mod2d = np.zeros((nbatch, maxlen), dtype=np.int32)
    for b in range(nbatch):
        seq2d[b, : lens[b]] = rng.randint(0, 8, lens[b])
        base0 = (seq2d[b, : lens[b]] % 4) == 0
        mod2d[b, : lens[b]] = base0 * rng.randint(0, 2, lens[b])
    can_mods_offsets = np.array([0, 2, 3, 4, 5], dtype=np.int32)
    weights = rng.rand(5).astype(np.float32) + 0.5

    jl = ff.cat_mod_flipflop_loss(
        jnp.asarray(lp_np), jnp.asarray(seq2d), jnp.asarray(lens),
        jnp.asarray(mod2d), can_mods_offsets, jnp.asarray(weights),
        sharpfact)
    jg = jax.grad(lambda x: ff.cat_mod_flipflop_loss(
        x, jnp.asarray(seq2d), jnp.asarray(lens), jnp.asarray(mod2d),
        can_mods_offsets, jnp.asarray(weights), sharpfact).sum())(
            jnp.asarray(lp_np))

    flat_seq = np.concatenate([seq2d[b, : lens[b]] for b in range(nbatch)])
    flat_mod = np.concatenate([mod2d[b, : lens[b]] for b in range(nbatch)])
    lp = torch.from_numpy(lp_np).requires_grad_(True)
    tl = ctc_shim.cat_mod_flipflop_loss(
        lp, torch.from_numpy(flat_seq), torch.from_numpy(lens),
        torch.from_numpy(flat_mod), can_mods_offsets, weights, sharpfact)
    tl.sum().backward()

    np.testing.assert_allclose(tl.detach().numpy(), np.asarray(jl), atol=1e-5)
    np.testing.assert_allclose(lp.grad.numpy(), np.asarray(jg), atol=2e-5)
