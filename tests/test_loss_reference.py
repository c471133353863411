"""The plain reference-style losses must agree with the optimized
custom-VJP CRF loss (up to the different normalization: reference-style
divides by T without the max-renormalization bookkeeping, the optimized
loss is -score/T as well — the values must match)."""

import jax.numpy as jnp
import numpy as np

from taiyaki_tpu import flipflopfings, loss
from taiyaki_tpu.ops import flipflop as ffops


def test_flipflop_loss_matches_optimized():
    rng = np.random.default_rng(0)
    T, B, L = 12, 3, 5
    x = rng.normal(size=(T, B, 40)).astype(np.float32)
    seqs = np.stack([flipflopfings.flipflop_code(rng.integers(0, 4, size=L))
                     for _ in range(B)])
    move_idx = np.stack([flipflopfings.move_indices(s) for s in seqs])
    stay_idx = np.stack([flipflopfings.stay_indices(s) for s in seqs])
    seqlens = np.full(B, L, dtype=np.int32)

    ref = loss.flipflop_loss(x, jnp.asarray(move_idx),
                             jnp.asarray(stay_idx), jnp.asarray(seqlens))
    opt = ffops.crf_flipflop_loss(jnp.asarray(x), jnp.asarray(seqs),
                                  jnp.asarray(seqlens))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(opt),
                               rtol=1e-4, atol=1e-5)


def test_flipflop_loss_sharpening():
    rng = np.random.default_rng(1)
    T, B, L = 8, 2, 4
    x = rng.normal(size=(T, B, 40)).astype(np.float32)
    seqs = np.stack([flipflopfings.flipflop_code(rng.integers(0, 4, size=L))
                     for _ in range(B)])
    move_idx = jnp.asarray(np.stack(
        [flipflopfings.move_indices(s) for s in seqs]))
    stay_idx = jnp.asarray(np.stack(
        [flipflopfings.stay_indices(s) for s in seqs]))
    seqlens = jnp.asarray(np.full(B, L, dtype=np.int32))
    a = loss.flipflop_loss(x, move_idx, stay_idx, seqlens, sharp=2.0)
    b = loss.flipflop_loss(2.0 * x, move_idx, stay_idx, seqlens) / 2.0
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_ctc_loss_hand_example():
    """One-base sequence over 2 blocks: paths are stay-then-move is
    impossible (must end at position 1) — enumerate by hand."""
    # features: base0..3, stay=4 (log(0) = -inf is intended: impossible
    # transitions; silence the divide-by-zero warning for -W error runs)
    with np.errstate(divide="ignore"):
        x = np.log(np.array([
            # t=0: move prob .6 (base 2), stay .4
            [[0.0, 0.0, 0.6, 0.0, 0.4]],
            # t=1: move prob .3 (base 2), stay .7
            [[0.0, 0.0, 0.3, 0.0, 0.7]],
        ], dtype=np.float32))
    seqs = jnp.asarray([[2]])
    seqlens = jnp.asarray([1])
    # paths reaching position 1 after 2 blocks:
    #   move@0 then stay@1: .6*.7 ; stay@0 then move@1: .4*.3
    expected = -np.log(0.6 * 0.7 + 0.4 * 0.3) / 2.0
    got = float(loss.ctc_loss(x, seqs, seqlens)[0])
    assert abs(got - expected) < 1e-5
