"""Reference (non-optimized) loss implementations in plain JAX.

Counterpart of taiyaki/loss.py: straightforward, autodiff-differentiated
scans used as readable specifications and cross-checks for the optimized
custom-VJP losses in ops/flipflop.py.  Not used by the bin/ scripts.
"""

import jax
import jax.numpy as jnp

_NEG = -1e30


def ctc_loss(x, seqs, seqlens, sharp=1.0):
    """Negative log-likelihood under a 5-feature CTC model
    (reference: taiyaki/loss.py:31-84).

    Args:
        x: [T, batch, 5] scores — features 0-3 are bases, feature 4 is the
            stay.
        seqs: [batch, npos] base indices (0-3), padded.
        seqlens: [batch] sequence lengths.
        sharp: sharpening factor.

    Returns:
        [batch] costs = -fwd[seqlen] / (T * sharp).
    """
    x = jnp.asarray(x, jnp.float32)
    nt, nb, nf = x.shape
    assert nf == 5, "CTC requires 5 features, got {}".format(nf)
    npos = seqs.shape[1]

    fwd0 = jnp.full((nb, npos + 1), _NEG).at[:, 0].set(0.0)

    def step(fwd, xt):
        xt = xt * sharp
        score = xt[:, 4][:, None] + fwd
        move = jnp.take_along_axis(xt, seqs, axis=1) + fwd[:, :-1]
        return score.at[:, 1:].set(jnp.logaddexp(move, score[:, 1:])), None

    fwd, _ = jax.lax.scan(step, fwd0, x)
    final = jnp.take_along_axis(fwd, seqlens[:, None], axis=1)[:, 0]
    return -final / (nt * sharp)


def flipflop_loss(x, move_idx, stay_idx, seqlens, sharp=1.0):
    """Negative log-likelihood under the flip-flop CRF (numerator only)
    (reference: taiyaki/loss.py:113-173).

    Args:
        x: [T, batch, 40] transition scores.
        move_idx: [batch, npos-1] move transition columns.
        stay_idx: [batch, npos] stay transition columns.
        seqlens: [batch] sequence lengths.

    Returns:
        [batch] costs = -fwd[seqlen - 1] / (T * sharp).
    """
    x = jnp.asarray(x, jnp.float32)
    nt, nb, nf = x.shape
    npos = stay_idx.shape[1]
    assert move_idx.shape[1] == npos - 1

    fwd0 = jnp.full((nb, npos), _NEG).at[:, 0].set(0.0)

    def step(fwd, xt):
        xt = xt * sharp
        score = jnp.take_along_axis(xt, stay_idx, axis=1) + fwd
        move = jnp.take_along_axis(xt, move_idx, axis=1) + fwd[:, :-1]
        return score.at[:, 1:].set(jnp.logaddexp(move, score[:, 1:])), None

    fwd, _ = jax.lax.scan(step, fwd0, x)
    final = jnp.take_along_axis(fwd, seqlens[:, None] - 1, axis=1)[:, 0]
    return -final / (nt * sharp)
