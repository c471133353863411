"""Native decodeutil tests (mirrors the reference's test_decodeutil.py
strategy): C++ forward == backward partition == JAX global-norm partition;
beam search recovers planted sequences and agrees with Viterbi on peaked
scores."""

import numpy as np
import pytest

from taiyaki_tpu import decodeutil, flipflopfings
from taiyaki_tpu.ops import decode as jdecode
from taiyaki_tpu.ops.flipflop import flipflop_logz


@pytest.fixture(scope="module", autouse=True)
def built():
    decodeutil._get_lib()


def _lse(v):
    m = np.max(v)
    return m + np.log(np.sum(np.exp(v - m)))


def test_forward_backward_rows_agree():
    """Reference contract (test_decodeutil.py:test_fwd_score_equals_bwd
    _score): with default (zero) inits, logsumexp(fwd[-1]) ==
    logsumexp(bwd[0]), and fwd[t] + bwd[t] composes to the same constant
    at every boundary (rows are ABSOLUTE, seeded by init)."""
    rng = np.random.default_rng(0)
    for nbase in (2, 4):
        S = flipflopfings.nstate_flipflop(nbase)
        x = rng.normal(size=(20, S)).astype(np.float32)
        fwd, _ = decodeutil.forward(x)
        bwd, _ = decodeutil.backward(x)
        f_score = _lse(fwd[-1])
        b_score = _lse(bwd[0])
        assert abs(f_score - b_score) < 1e-3
        comp = np.array([_lse(fwd[t] + bwd[t]) for t in range(len(fwd))])
        np.testing.assert_allclose(comp, f_score, atol=2e-3)


def test_partition_matches_jax_logz():
    """Reference contract (test_fwd_equals_global_norm /
    test_bwd_equals_global_norm): flip-only-init forward rows and the
    flip slice of zero-init backward rows both reproduce the training
    partition function."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(15, 40)).astype(np.float32)
    nbase = 4
    logz_j = float(flipflop_logz(x[:, None, :])[0])
    init = np.zeros(2 * nbase, dtype=np.float32)
    init[nbase:] = -50000.0
    fwd, _ = decodeutil.forward(x, init=init)
    assert abs(_lse(fwd[-1]) - logz_j) < 1e-3
    bwd, logz_b = decodeutil.backward(x)
    assert abs(_lse(bwd[0, :nbase]) - logz_j) < 1e-3
    # the C return value is exactly that flips-only quantity
    assert abs(logz_b - logz_j) < 1e-3


def test_beamsearch_recovers_planted_sequence():
    nbase = 4
    S = flipflopfings.nstate_flipflop(nbase)
    # Plant a path A C G G(flop) T = states 0,1,2,6,3 with stays between.
    planted = [0, 0, 1, 1, 2, 6, 6, 3, 3]
    T = len(planted) - 1
    x = np.full((T, S), -4.0, dtype=np.float32)

    def code(frm, to):
        return frm + 2 * nbase * min(to, nbase)

    for t in range(T):
        x[t, code(planted[t], planted[t + 1])] = 3.0
    for guided in (False, True):
        seq, score = decodeutil.beamsearch(x, beam_width=8, guided=guided)
        expect = [planted[0]] + [planted[i + 1] for i in range(T)
                                 if planted[i + 1] != planted[i]]
        assert seq.tolist() == expect, (guided, seq.tolist(), expect)


def test_beamsearch_agrees_with_viterbi_on_peaked_scores():
    """With strongly peaked scores the beam-search sequence equals the
    collapsed Viterbi path."""
    rng = np.random.default_rng(7)
    x = (5.0 * rng.normal(size=(40, 40))).astype(np.float32)
    _, _, path = jdecode.flipflop_viterbi(x[:, None, :])
    path = np.asarray(path[:, 0])
    vit_seq = [int(path[0])] + [int(path[i + 1]) for i in range(len(x))
                                if path[i + 1] != path[i]]
    seq, _ = decodeutil.beamsearch(x, beam_width=16, guided=True)
    assert seq.tolist() == vit_seq


def test_beamsearch_marginal_beats_or_matches_viterbi_score():
    """Beam element scores are path *sums*; with a wide beam the winning
    sequence's score must be >= the viterbi path's score."""
    rng = np.random.default_rng(11)
    x = rng.normal(size=(12, 12)).astype(np.float32)  # nbase=2
    seq, score = decodeutil.beamsearch(x, beam_width=64, guided=False)
    fwd, _, path = jdecode.flipflop_viterbi(x[:, None, :])
    vit_score = float(np.max(np.asarray(fwd[-1, 0])))
    assert score >= vit_score - 1e-4


def test_beamsearch_path_validity():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(30, 40)).astype(np.float32)
    seq, _ = decodeutil.beamsearch(x, beam_width=5)
    assert seq[0] < 4  # starts in a flip state
    for a, b in zip(seq[:-1], seq[1:]):
        assert a != b
        if b >= 4:
            assert a == b - 4  # flop only reachable from matching flip
