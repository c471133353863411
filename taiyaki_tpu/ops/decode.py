"""Flip-flop decoding: Viterbi best path and posterior transition probs.

TPU-native equivalents of taiyaki/decode.py and the cupy Viterbi/make_trans
kernels (taiyaki/cupy_extensions/flipflop.py:248-518): `lax.scan` over time
with a max-reduction lattice over the 2*nbase flip-flop states, followed by
a reverse traceback scan.
"""

import jax
import jax.numpy as jnp

from taiyaki_tpu import flipflopfings
from taiyaki_tpu.constants import LARGE_VAL
from taiyaki_tpu.ops.flipflop import flipflop_logz


def flipflop_viterbi(scores):
    """Highest-scoring flip-flop path per batch element.

    Args:
        scores: [T, batch, nstate] log-scale transition scores
            (nstate = 2*nbase*(nbase+1)).

    Returns:
        (fwd [T+1, batch, 2*nbase], traceback [T, batch, 2*nbase] int32,
         path [T+1, batch] int32) — same contract as the reference's
        decode.flipflop_viterbi (taiyaki/decode.py:15-39,76-115).
    """
    scores = jnp.asarray(scores)
    T, N, S = scores.shape
    nbase = flipflopfings.nbase_flipflop(S)
    nff = 2 * nbase

    fwd0 = jnp.concatenate(
        [jnp.zeros((N, nbase), scores.dtype),
         jnp.full((N, nbase), -LARGE_VAL, scores.dtype)], axis=1)

    base_ids = jnp.arange(nbase, dtype=jnp.int32)

    def fwd_step(fwd, scores_t):
        # Transitions into flip states: any source allowed.
        to_flip = scores_t[:, :S - nff].reshape(N, nbase, nff)
        cand_flip = fwd[:, None, :] + to_flip          # [N, nbase, 2nb]
        new_flip = jnp.max(cand_flip, axis=2)
        tb_flip = jnp.argmax(cand_flip, axis=2).astype(jnp.int32)
        # Transitions into flop states: from matching flip or stay in flop.
        cand_flop = (fwd + scores_t[:, S - nff:]).reshape(N, 2, nbase)
        new_flop = jnp.max(cand_flop, axis=1)
        tb_flop = (jnp.argmax(cand_flop, axis=1).astype(jnp.int32) * nbase
                   + base_ids[None, :])
        new = jnp.concatenate([new_flip, new_flop], axis=1)
        tb = jnp.concatenate([tb_flip, tb_flop], axis=1)
        return new, (new, tb)

    fwd_final, (fwd_all, traceback) = jax.lax.scan(
        fwd_step, fwd0, scores, unroll=8)
    fwd = jnp.concatenate([fwd0[None], fwd_all], axis=0)

    path_T = jnp.argmax(fwd_final, axis=1).astype(jnp.int32)
    batch_ix = jnp.arange(N)

    def back_step(nxt, tb_t):
        prev = tb_t[batch_ix, nxt]
        return prev, prev

    _, path_rest = jax.lax.scan(back_step, path_T, traceback,
                                reverse=True, unroll=8)
    path = jnp.concatenate([path_rest, path_T[None]], axis=0)
    return fwd, traceback, path


def flipflop_make_trans(scores):
    """Posterior transition probabilities (NOT logs).

    Equal to d(logZ)/d(scores) (taiyaki/decode.py:42-73) — computed here by
    autodiff of the partition-function scan.

    Args:
        scores: [T, batch, nstate] globally-normalisable transition scores.

    Returns:
        [T, batch, nstate] float32 posterior probabilities.
    """
    scores = jnp.asarray(scores, jnp.float32)
    return jax.grad(lambda s: jnp.sum(flipflop_logz(s)))(scores)


def global_norm_flipflop(scores):
    """Globally normalize scores so the partition function is 1
    (reference: taiyaki/layers.py:1302-1313)."""
    scores = jnp.asarray(scores)
    T = scores.shape[0]
    logz = flipflop_logz(scores)
    return scores - (logz / T)[None, :, None]
