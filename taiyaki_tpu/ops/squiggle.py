"""Squiggle-match DTW: align observed current to a predicted squiggle.

TPU-native equivalent of the reference's C kernel
(taiyaki/squiggle_match/c_squiggle_match.c) and its Cython wrapper
(squiggle_match.pyx).

Model: 2*npos states — each sequence position plus a "backwards" shadow
state entered with probability back_prob.  Emissions are Laplace(location,
scale) with per-position parameters (level, log-scale); move probability is
(1 - back_prob) * logistic(rate).  The training cost is the negative
forward log-probability; here the forward recursion is a differentiable
`lax.scan`, so the gradient (which the reference hand-derives via
forward+backward posteriors, c_squiggle_match.c:591-694) comes from
autodiff of the same recursion — verified equal by finite differences in
tests.

The glocal Viterbi path used by map_to_squiggle (squiggle_match_viterbi,
c_squiggle_match.c:269-455) is provided host-side in numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np

from taiyaki_tpu.constants import DEFAULT_ALPHABET, LARGE_LOG_VAL

_LARGE = 1e30

# Vertices of a regular tetrahedron: the base embedding for squiggle
# prediction (reference: squiggle_match.pyx:18-23).
CARTESIAN_TETRAHEDRON = np.array(
    [[1.0, 0.0, -1.0 / np.sqrt(2.0)],
     [-1.0, 0.0, -1.0 / np.sqrt(2.0)],
     [0.0, 1.0, 1.0 / np.sqrt(2.0)],
     [0.0, -1.0, 1.0 / np.sqrt(2.0)]], dtype=np.float32)


def embed_sequence(seq, alphabet=DEFAULT_ALPHABET):
    """Embed a base sequence at tetrahedron vertices -> [len, 3] float32.

    seq may be a string over `alphabet` or an integer label array
    (alphabet=None).
    """
    if alphabet is None:
        idx = np.asarray(seq, dtype=np.int64)
    else:
        lut = {b: i for i, b in enumerate(alphabet)}
        idx = np.array([lut[b] for b in seq])
    return CARTESIAN_TETRAHEDRON[idx]


def squiggle_match_cost(params, signals, siglens, back_prob):
    """Negative forward log-probabilities of signals under predicted
    squiggles.

    Args:
        params: [npos, batch, 3] predicted (level, log scale, rate).
        signals: [maxlen, batch] observed currents, padded.
        siglens: [batch] true signal lengths.
        back_prob: probability of entering the backwards state.

    Returns:
        [batch] float32 costs (= -forward score; reference pyx returns
        -costs unnormalised, squiggle_match.pyx:48).
    """
    params = jnp.asarray(params, jnp.float32)
    signals = jnp.asarray(signals, jnp.float32)
    siglens = jnp.asarray(siglens)
    npos, nbatch, _ = params.shape

    loc = params[:, :, 0].T                        # [batch, npos]
    logscale = params[:, :, 1].T
    scale = jnp.exp(logscale)
    # log-space penalties via log_sigmoid: the naive
    # log1p(-(1-b)*sigmoid(r) - b) rounds to log(0) = -inf once
    # sigmoid(r) hits 1.0 in f32 (r >= ~17, reachable in training) and
    # its autodiff emits inf*0 = NaN gradients for EVERY parameter;
    # algebraically 1 - move_p - b = (1-b)*(1-sigmoid(r)), so both
    # penalties are finite for all r (the reference's analytic C
    # gradient is likewise NaN-free, c_squiggle_match.c)
    rate = params[:, :, 2].T
    log_no_back = jnp.log1p(-back_prob)
    move_pen = log_no_back + jax.nn.log_sigmoid(rate)
    stay_pen = log_no_back + jax.nn.log_sigmoid(-rate)
    move_back_pen = jnp.log(back_prob)
    half = jnp.log(0.5)

    # fwd state: [batch, 2*npos] = [normal positions | backward states]
    fwd0 = jnp.full((nbatch, 2 * npos), -_LARGE, jnp.float32)
    fwd0 = fwd0.at[:, 0].set(0.0)

    sample_idx = jnp.arange(signals.shape[0])

    def step(carry, xs):
        fwd, = carry
        sig_t, t = xs
        normal, back = fwd[:, :npos], fwd[:, npos:]
        new_normal = normal + stay_pen
        new_back = back + half
        # move to next position
        new_normal = new_normal.at[:, 1:].set(jnp.logaddexp(
            new_normal[:, 1:], normal[:, :-1] + move_pen[:, 1:]))
        # move backwards: from position p to back state p-1
        new_back = new_back.at[:, :-1].set(jnp.logaddexp(
            new_back[:, :-1], normal[:, 1:] + move_back_pen))
        # return from back state p-1 to position p
        new_normal = new_normal.at[:, 1:].set(jnp.logaddexp(
            new_normal[:, 1:], back[:, :-1] + half))
        # Laplace emission at every position
        logscore = (-jnp.abs(sig_t[:, None] - loc) / scale - logscale
                    - jnp.log(2.0))
        new = jnp.concatenate([new_normal + logscore, new_back + logscore],
                              axis=1)
        # freeze finished signals
        active = (t < siglens)[:, None]
        new = jnp.where(active, new, fwd)
        return (new,), None

    (fwd_final,), _ = jax.lax.scan(step, (fwd0,), (signals, sample_idx))
    return -fwd_final[:, npos - 1]


squiggle_match_loss = squiggle_match_cost


def squiggle_match_viterbi_path(params, signal, back_prob, localpen=None,
                                minscore=None):
    """Best glocal alignment path of one signal to a predicted squiggle
    (host-side numpy; reference: squiggle_match_viterbi,
    c_squiggle_match.c:269-455).

    Args:
        params: [npos, 3] squiggle parameters.
        signal: [nsample] observed current.
        back_prob: probability of backwards move.
        localpen: per-sample cost of sitting in start/end states (None ->
            effectively global alignment).
        minscore: floor on per-sample emission scores (None -> no floor).

    Returns:
        (score, path [nsample]) — path entries are sequence positions, -1
        in clipped head/tail.

    Dispatches to the C++ kernel (decodeutil.squiggle_viterbi) unless
    TAIYAKI_TPU_NO_NATIVE=1; the numpy loop below is the tested
    reference semantics and the fallback.
    """
    import os
    params = np.asarray(params, dtype=np.float32)
    signal = np.asarray(signal, dtype=np.float32)
    localpen = LARGE_LOG_VAL if localpen is None else localpen
    minscore = LARGE_LOG_VAL if minscore is None else minscore
    if os.environ.get("TAIYAKI_TPU_NO_NATIVE") != "1":
        from taiyaki_tpu import decodeutil
        return decodeutil.squiggle_viterbi(params, signal, back_prob,
                                           localpen, minscore)
    npos = len(params)
    nsample = len(signal)
    nfstate = npos + 2                 # start + positions + end
    nstate = nfstate + npos            # + backward states

    loc, logscale, rate = params[:, 0], params[:, 1], params[:, 2]
    scale = np.exp(logscale)
    move_p = (1.0 - back_prob) * (0.5 * (1.0 + np.tanh(rate / 2.0)))
    move_pen = np.empty(nfstate, dtype=np.float64)
    stay_pen = np.empty(nfstate, dtype=np.float64)
    move_pen[1:npos + 1] = np.log(move_p)
    stay_pen[1:npos + 1] = np.log1p(-move_p - back_prob)
    move_pen[0] = move_pen[npos + 1] = move_pen[1:npos + 1].mean()
    stay_pen[0] = stay_pen[npos + 1] = stay_pen[1:npos + 1].mean()
    move_back_pen = np.log(back_prob)
    half = np.log(0.5)

    fwd = np.full(nstate, -_LARGE)
    fwd[0] = 0.0
    traceback = np.zeros((nsample, nstate), dtype=np.int32)

    for t in range(nsample):
        prev = fwd
        curr = prev + np.concatenate([stay_pen, np.full(npos, half)])
        tb = np.arange(nstate, dtype=np.int32)
        # move to next full state
        cand = prev[:nfstate - 1] + move_pen[:nfstate - 1]
        better = cand > curr[1:nfstate]
        curr[1:nfstate] = np.where(better, cand, curr[1:nfstate])
        tb[1:nfstate] = np.where(better, np.arange(nfstate - 1), tb[1:nfstate])
        # start -> any position (local clipping of head), vectorized over
        # destination positions 1..npos-1 (states 2..npos)
        head = prev[0] + move_pen[0] - localpen * np.arange(1, npos)
        better = head > curr[2:npos + 1]
        curr[2:npos + 1] = np.where(better, head, curr[2:npos + 1])
        tb[2:npos + 1] = np.where(better, 0, tb[2:npos + 1])
        # any position -> end (local clipping of tail): only the best
        # origin can win; argmax returns the FIRST maximum, matching the
        # sequential loop's strict-improvement tie-break
        origst = np.arange(1, npos)
        tail = (prev[origst] + move_pen[origst]
                - localpen * (npos - origst))
        if len(tail):   # npos == 1: no tail origins (C++ guards npos > 1)
            k = int(np.argmax(tail))
            if tail[k] > curr[nfstate - 1]:
                curr[nfstate - 1] = tail[k]
                tb[nfstate - 1] = origst[k]
        # position p+1 -> back state p
        cand = prev[2:npos + 1] + move_back_pen
        idx = nfstate + np.arange(npos - 1)
        better = cand > curr[idx]
        curr[idx] = np.where(better, cand, curr[idx])
        tb[idx] = np.where(better, np.arange(2, npos + 1), tb[idx])
        # back state p -> position p+1
        cand = prev[nfstate:nfstate + npos - 1] + half
        better = cand > curr[2:npos + 1]
        curr[2:npos + 1] = np.where(better, cand, curr[2:npos + 1])
        tb[2:npos + 1] = np.where(
            better, nfstate + np.arange(npos - 1), tb[2:npos + 1])
        # emissions
        logscore = np.maximum(
            -minscore,
            -np.abs(signal[t] - loc) / scale - logscale - np.log(2.0))
        curr[1:npos + 1] += logscore
        curr[nfstate:] += logscore
        curr[0] -= localpen
        curr[nfstate - 1] -= localpen
        traceback[t] = tb
        fwd = curr

    path = np.zeros(nsample, dtype=np.int32)
    if fwd[nfstate - 2] > fwd[nfstate - 1]:
        score, path[-1] = fwd[nfstate - 2], nfstate - 2
    else:
        score, path[-1] = fwd[nfstate - 1], nfstate - 1
    for t in range(nsample - 1, 0, -1):
        path[t - 1] = traceback[t, path[t]]

    # encode start/end as -1; full states offset by 1; back states by nfstate
    out = path.copy()
    lo = 0
    while lo < nsample and out[lo] == 0:
        out[lo] = -1
        lo += 1
    hi = nsample
    while hi > 0 and out[hi - 1] == nfstate - 1:
        out[hi - 1] = -1
        hi -= 1
    mid = out[lo:hi]
    mid = np.where(mid >= nfstate, mid - nfstate, mid - 1)
    out[lo:hi] = mid
    return float(score), out
