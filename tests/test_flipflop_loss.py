"""Tests for the flip-flop CRF loss and partition function.

Strategy mirrors the reference's test_ctc_loss.py: construct a tiny
transition-weight matrix where every path's probability is a known product,
then check loss == -log(P(seq))/nblk and finite-difference the gradient.
Additionally the custom_vjp backward (posterior DP) is cross-checked against
plain autodiff through the forward scan — two independent algorithms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taiyaki_tpu import flipflopfings
from taiyaki_tpu.constants import SMALL_VAL
from taiyaki_tpu.ops import flipflop as ffops

NBASE = 4
NBLK = 4
NTRANS = flipflopfings.nstate_flipflop(NBASE)  # 40


def transition_code(fromstate, tostate, nbase=NBASE):
    """Column of the transition weight matrix for fromstate -> tostate."""
    if tostate < nbase:
        return tostate * 2 * nbase + fromstate
    return 2 * nbase * nbase + fromstate


def build_outputs():
    """Weight matrix where exactly two paths have nonzero probability.

    Sequence ACC (flip-flop 0,1,5) via path [0,0,1,5,5] with weights
    [1,1,.5,1]; sequence GTt (2,3,7) via path [2,2,3,7,7] with weights
    [1,.5,1,1].  After global normalization P(each) = 0.5.
    """
    paths = {"015": [0, 0, 1, 5, 5], "237": [2, 2, 3, 7, 7]}
    weights = {"015": [1.0, 1.0, 0.5, 1.0], "237": [1.0, 0.5, 1.0, 1.0]}
    out = np.zeros((NBLK, 1, NTRANS), dtype=np.float32)
    for k, path in paths.items():
        for blk in range(NBLK):
            out[blk, 0, transition_code(path[blk], path[blk + 1])] = (
                weights[k][blk])
    out = np.log(out + SMALL_VAL)
    probs = {k: float(np.prod(v)) for k, v in weights.items()}
    probs["510"] = 0.0
    total = sum(probs.values())
    return out, {k: v / total for k, v in probs.items()}


SEQS = {"015": [0, 1, 5], "237": [2, 3, 7], "510": [5, 1, 0]}


@pytest.fixture(scope="module")
def normed_outputs():
    out, probs = build_outputs()
    out = np.asarray(out - np.asarray(ffops.flipflop_logz(out))[None, :, None]
                     / NBLK)
    return out, probs


def test_logz_of_normalized_outputs_is_zero(normed_outputs):
    out, _ = normed_outputs
    logz = ffops.flipflop_logz(out)
    assert abs(float(logz[0])) < 1e-4


def test_loss_equals_path_probability(normed_outputs):
    out, probs = normed_outputs
    for name, seq in SEQS.items():
        seqs = jnp.asarray([flipflopfings.flipflop_code(np.array(seq))
                            if name != "510" else np.array(seq)])
        seqs = jnp.asarray([np.array(seq)])
        cost = ffops.crf_flipflop_loss(jnp.asarray(out), seqs,
                                       jnp.asarray([3]))
        p = float(jnp.exp(-cost[0] * NBLK))
        assert abs(p - probs[name]) < 1e-4, (name, p, probs[name])


def test_finite_difference_gradient(normed_outputs):
    out, _ = normed_outputs
    rng = np.random.default_rng(7)
    seqs = jnp.asarray([SEQS["015"]])
    seqlens = jnp.asarray([3])

    def loss_fn(x):
        return jnp.sum(ffops.crf_flipflop_loss(x, seqs, seqlens))

    x0 = jnp.asarray(out)
    g = jax.grad(loss_fn)(x0)
    dx = rng.normal(size=out.shape).astype(np.float32) * 1e-3
    actual = float(loss_fn(x0 + dx) - float(loss_fn(x0)))
    predicted = float(jnp.sum(g * dx))
    base = abs(float(loss_fn(x0)))
    assert abs(actual - predicted) / base < 1e-4


def test_custom_vjp_matches_autodiff(normed_outputs):
    """Posterior-DP backward vs plain autodiff through the forward scan."""
    out, _ = normed_outputs
    rng = np.random.default_rng(3)
    # Perturb so scores are generic (no exact zeros of probability).
    x0 = jnp.asarray(out + rng.normal(size=out.shape).astype(np.float32))
    seqs = jnp.asarray([SEQS["015"]])
    seqlens = jnp.asarray([3])
    stay_idx, move_idx = ffops.make_seq_indices(seqs, NBASE)

    def via_custom(x):
        return jnp.sum(ffops._crf_loss_core(x, stay_idx, move_idx, seqlens))

    def via_autodiff(x):
        score, _ = ffops._forward_scores(
            x, stay_idx, move_idx, None, None, seqlens,
            collect_lattice=False)
        return jnp.sum(ffops._masked_cost(score, seqlens, x.shape[0]))

    assert abs(float(via_custom(x0)) - float(via_autodiff(x0))) < 1e-5
    g1 = jax.grad(via_custom)(x0)
    g2 = jax.grad(via_autodiff)(x0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_padded_batch_matches_individual():
    """Padding + batching must not change per-read costs."""
    rng = np.random.default_rng(11)
    T = 6
    x = rng.normal(size=(T, 2, NTRANS)).astype(np.float32)
    seq_a = flipflopfings.flipflop_code(rng.integers(0, 4, size=4))
    seq_b = flipflopfings.flipflop_code(rng.integers(0, 4, size=2))
    # batch: pad b to length 4
    seqs = np.zeros((2, 4), dtype=np.int64)
    seqs[0, :] = seq_a
    seqs[1, :2] = seq_b
    costs = ffops.crf_flipflop_loss(jnp.asarray(x), jnp.asarray(seqs),
                                    jnp.asarray([4, 2]))
    cost_a = ffops.crf_flipflop_loss(jnp.asarray(x[:, :1]),
                                     jnp.asarray([seq_a]), jnp.asarray([4]))
    cost_b = ffops.crf_flipflop_loss(jnp.asarray(x[:, 1:]),
                                     jnp.asarray([seq_b]), jnp.asarray([2]))
    assert abs(float(costs[0]) - float(cost_a[0])) < 1e-5
    assert abs(float(costs[1]) - float(cost_b[0])) < 1e-5


def test_empty_sequence_zero_cost_and_grad():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(3, 1, NTRANS)).astype(np.float32))
    seqs = jnp.zeros((1, 4), dtype=jnp.int32)
    cost, g = jax.value_and_grad(
        lambda v: jnp.sum(ffops.crf_flipflop_loss(v, seqs,
                                                  jnp.asarray([0]))))(x)
    assert float(cost) == 0.0
    assert float(jnp.abs(g).max()) == 0.0


def test_sharpening_scales_scores():
    """sharpfact=2 must equal running the DP on doubled scores, cost/2."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(5, 1, NTRANS)).astype(np.float32))
    seq = jnp.asarray([flipflopfings.flipflop_code(
        rng.integers(0, 4, size=3))])
    seqlens = jnp.asarray([3])
    c_sharp = ffops.crf_flipflop_loss(x, seq, seqlens, sharpfact=2.0)
    c_manual = ffops.crf_flipflop_loss(2.0 * x, seq, seqlens) / 2.0
    assert abs(float(c_sharp[0]) - float(c_manual[0])) < 1e-5


def test_sharpened_gradient_reference_convention():
    """Reference convention: gradient is evaluated at sharpened scores and
    not divided by sharpfact — for the canonical loss this IS the true
    gradient of the returned cost (chain rule cancels)."""
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(5, 1, NTRANS)).astype(np.float32))
    seq = jnp.asarray([flipflopfings.flipflop_code(
        rng.integers(0, 4, size=3))])
    seqlens = jnp.asarray([3])

    def loss_fn(v):
        return jnp.sum(ffops.crf_flipflop_loss(v, seq, seqlens,
                                               sharpfact=1.7))

    g = jax.grad(loss_fn)(x)
    dx = rng.normal(size=x.shape).astype(np.float32) * 1e-3
    actual = float(loss_fn(x + dx)) - float(loss_fn(x))
    predicted = float(jnp.sum(g * dx))
    assert abs(actual - predicted) / abs(float(loss_fn(x))) < 2e-4


# -- cat_mod -----------------------------------------------------------------

def _cat_mod_setup(rng, nmods=(1, 0, 2, 0)):
    can_nmods = np.array(nmods)
    can_mods_offsets = np.cumsum(np.concatenate([[0], can_nmods + 1])).astype(
        np.int32)
    # The loss consumes the cat_mod layer *output*: 2L(L+1) transition
    # columns followed by the grouped-log-softmax mod stream of width
    # sum(can_nmods + 1) (taiyaki/layers.py:1616-1640).
    nstate = NTRANS + int((can_nmods + 1).sum())
    T, L = 5, 3
    x = rng.normal(size=(T, 1, nstate)).astype(np.float32)
    base_seq = rng.integers(0, 4, size=L)
    seq = flipflopfings.flipflop_code(base_seq)
    mod_cats = np.zeros(L, dtype=np.int64)
    for i, b in enumerate(base_seq):
        if can_nmods[b] > 0 and rng.random() < 0.5:
            mod_cats[i] = rng.integers(1, can_nmods[b] + 1)
    # mod_cat_weights is indexed by can_mods_offsets[base] + mod_cat, so it
    # spans the whole grouped stream: length sum(can_nmods + 1).
    weights = np.ones(int((can_nmods + 1).sum()), dtype=np.float32)
    return (jnp.asarray(x), jnp.asarray([seq]), jnp.asarray([L]),
            jnp.asarray([mod_cats]), can_mods_offsets, weights)


def test_cat_mod_zero_weight_reduces_to_canonical():
    rng = np.random.default_rng(23)
    x, seq, seqlens, mod_cats, offsets, weights = _cat_mod_setup(rng)
    cost_mod = ffops.cat_mod_flipflop_loss(
        x, seq, seqlens, mod_cats, offsets, np.zeros_like(weights))
    cost_can = ffops.crf_flipflop_loss(x[:, :, :NTRANS], seq, seqlens)
    assert abs(float(cost_mod[0]) - float(cost_can[0])) < 1e-5


def test_cat_mod_finite_difference_gradient():
    rng = np.random.default_rng(29)
    x, seq, seqlens, mod_cats, offsets, weights = _cat_mod_setup(rng)
    weights = weights * 0.7

    def loss_fn(v):
        return jnp.sum(ffops.cat_mod_flipflop_loss(
            v, seq, seqlens, mod_cats, offsets, weights))

    g = jax.grad(loss_fn)(x)
    dx = rng.normal(size=x.shape).astype(np.float32) * 1e-3
    actual = float(loss_fn(x + dx)) - float(loss_fn(x))
    predicted = float(jnp.sum(g * dx))
    assert abs(actual - predicted) / abs(float(loss_fn(x))) < 2e-4


def test_cat_mod_sharpened_gradient_reference_convention():
    """Reference convention (CatModFlipFlop.backward, ctc.pyx:305-312):
    the gradient is the core DP gradient evaluated AT the sharpened
    scores for ALL columns — no trans_sharp chain factor, no /sharpfact.
    Plain autodiff would divide the MOD columns by sharpfact."""
    rng = np.random.default_rng(37)
    x, seq, seqlens, mod_cats, offsets, weights = _cat_mod_setup(rng)
    sharpfact = 2.0

    g = jax.grad(lambda v: jnp.sum(ffops.cat_mod_flipflop_loss(
        v, seq, seqlens, mod_cats, offsets, weights,
        sharpfact=sharpfact)))(x)

    # the reference gradient: d core / d lp at lp = sharpened scores
    stay_idx, move_idx = ffops.make_seq_indices(seq, NBASE)
    mod_seq = (jnp.asarray(offsets)[jnp.mod(seq[:, 1:], NBASE)]
               + mod_cats[:, 1:])
    modmove_idx = (NTRANS + mod_seq).astype(jnp.int32)
    modmove_fact = jnp.asarray(weights)[mod_seq].astype(jnp.float32)
    trans_sharp = jnp.where(jnp.arange(x.shape[2]) < NTRANS,
                            sharpfact, 1.0)
    g_ref = jax.grad(lambda v: jnp.sum(ffops._cat_mod_loss_core(
        v, stay_idx, move_idx, modmove_idx, modmove_fact, seqlens)))(
            x * trans_sharp)

    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
    # sanity: the convention is NOT plain autodiff for mod columns
    assert not np.allclose(np.asarray(g[:, :, NTRANS:]),
                           np.asarray(g_ref[:, :, NTRANS:]) / sharpfact)


def test_cat_mod_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(31)
    x, seq, seqlens, mod_cats, offsets, weights = _cat_mod_setup(rng)
    n_can_trans = NTRANS
    nbase = NBASE
    stay_idx, move_idx = ffops.make_seq_indices(seq, nbase)
    mod_seq = (jnp.asarray(offsets)[jnp.mod(seq[:, 1:], nbase)]
               + mod_cats[:, 1:])
    modmove_idx = (n_can_trans + mod_seq).astype(jnp.int32)
    modmove_fact = jnp.asarray(weights)[mod_seq].astype(jnp.float32)

    def via_custom(v):
        return jnp.sum(ffops._cat_mod_loss_core(
            v, stay_idx, move_idx, modmove_idx, modmove_fact, seqlens))

    def via_autodiff(v):
        score, _ = ffops._forward_scores(
            v, stay_idx, move_idx, modmove_idx, modmove_fact, seqlens,
            collect_lattice=False)
        return jnp.sum(ffops._masked_cost(score, seqlens, v.shape[0]))

    g1 = jax.grad(via_custom)(x)
    g2 = jax.grad(via_autodiff)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_logz_matches_brute_force_two_base():
    """Brute-force enumeration of all paths for a 2-base model, 3 blocks."""
    nbase = 2
    ntrans = flipflopfings.nstate_flipflop(nbase)  # 12
    rng = np.random.default_rng(37)
    x = rng.normal(size=(3, 1, ntrans)).astype(np.float32)

    def tcode(frm, to):
        if to < nbase:
            return to * 2 * nbase + frm
        assert to == frm + nbase or to == frm  # flip->flop same base or stay
        return 2 * nbase * nbase + frm

    def allowed(frm, to):
        if to < nbase:
            return True  # anything -> flip
        if to == frm:
            return True  # stay in flop
        return frm < nbase and to == frm + nbase  # flip -> matching flop

    states = list(range(2 * nbase))
    total = -np.inf
    # paths: state sequence s0..s3, s0 free (init prob 1 over flips... )
    # reference logZ init: flip states weight 1, flop states ~0.
    for s0 in range(nbase):
        stack = [(s0, 0, 0.0)]
        while stack:
            s, t, acc = stack.pop()
            if t == 3:
                total = np.logaddexp(total, acc)
                continue
            for nxt in states:
                if allowed(s, nxt):
                    stack.append((nxt, t + 1, acc + x[t, 0, tcode(s, nxt)]))
    logz = float(ffops.flipflop_logz(jnp.asarray(x))[0])
    assert abs(logz - total) < 1e-4


def test_cat_mod_loss_works_under_jit():
    """Regression: can_mods_offsets splitting must stay concrete when the
    loss is traced (the trainer jits the whole step)."""
    rng = np.random.default_rng(41)
    x, seq, seqlens, mod_cats, offsets, weights = _cat_mod_setup(rng)

    @jax.jit
    def f(v):
        return ffops.cat_mod_flipflop_loss(
            v, seq, seqlens, mod_cats, offsets, weights)

    out = f(x)
    ref = ffops.cat_mod_flipflop_loss(
        x, seq, seqlens, mod_cats, offsets, weights)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_degenerate_seqlen_no_nan_gradient():
    """A chunk whose sequence is longer than nblk + 1 has NO valid path:
    cost must be huge/inf-ish and the gradient all-zero for that row —
    never NaN.  (Round-2 regression: the Pallas backward divided 0/0
    because its 1e-38 denom guard is subnormal in f32 and flushed to
    zero; degenerate rows NaN'd the whole batch's gradients.  Exercises
    the scan path on CPU; the Pallas path was verified on-chip.)"""
    import jax
    import jax.numpy as jnp
    from taiyaki_tpu.ops import flipflop as ffops
    from taiyaki_tpu.flipflopfings import flipflop_code

    rng = np.random.default_rng(0)
    T, B, maxseq = 16, 4, 64
    tw = jnp.asarray(rng.normal(size=(T, B, 40)).astype(np.float32))
    seqs = np.zeros((B, maxseq), np.int32)
    lens = np.array([10, 40, 12, 60], np.int32)  # rows 1,3 degenerate
    for i in range(B):
        seqs[i, :lens[i]] = flipflop_code(rng.integers(0, 4, size=lens[i]))

    def f(tw):
        return ffops.crf_flipflop_loss(tw, jnp.asarray(seqs),
                                       jnp.asarray(lens), 1.0).sum()

    loss, g = jax.value_and_grad(f)(tw)
    g = np.asarray(g)
    assert not np.isnan(g).any()
    assert np.isfinite(np.asarray(
        ffops.crf_flipflop_loss(tw, jnp.asarray(seqs),
                                jnp.asarray(lens), 1.0))[[0, 2]]).all()
    # degenerate rows contribute zero gradient
    assert np.abs(g[:, [1, 3], :]).max() == 0.0
    assert np.abs(g[:, [0, 2], :]).max() > 0.0
