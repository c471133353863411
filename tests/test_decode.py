"""Decoding tests: Viterbi on hand-built score tensors (mirrors the
reference's test_decode.py strategy), make_trans vs brute force, qscores,
and chunk/stitch round-trips."""

import numpy as np
import pytest

from taiyaki_tpu import basecall_helpers, flipflopfings, qscores
from taiyaki_tpu.ops import decode


def tcode(frm, to, nbase):
    if to < nbase:
        return to * 2 * nbase + frm
    return 2 * nbase * nbase + frm


def test_viterbi_recovers_planted_path():
    """Plant a high-scoring path in an otherwise low-scoring tensor."""
    nbase = 2
    S = flipflopfings.nstate_flipflop(nbase)  # 12
    T = 6
    planted = [0, 0, 1, 3, 3, 1, 0]  # valid transitions for nbase=2
    x = np.full((T, 1, S), -5.0, dtype=np.float32)
    for t in range(T):
        x[t, 0, tcode(planted[t], planted[t + 1], nbase)] = 2.0
    fwd, tb, path = decode.flipflop_viterbi(x)
    np.testing.assert_array_equal(np.asarray(path[:, 0]), planted)
    assert fwd.shape == (T + 1, 1, 2 * nbase)
    assert tb.shape == (T, 1, 2 * nbase)


def test_viterbi_batch_independence():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(8, 3, 40)).astype(np.float32)
    _, _, path_all = decode.flipflop_viterbi(x)
    for b in range(3):
        _, _, path_b = decode.flipflop_viterbi(x[:, b:b + 1])
        np.testing.assert_array_equal(np.asarray(path_all[:, b]),
                                      np.asarray(path_b[:, 0]))


def test_make_trans_is_posterior():
    """Posterior transition probs: block sums == 1 after global norm; matches
    brute-force path enumeration marginals for a tiny case."""
    nbase = 2
    S = flipflopfings.nstate_flipflop(nbase)
    rng = np.random.default_rng(11)
    x = rng.normal(size=(3, 1, S)).astype(np.float32)
    trans = np.asarray(decode.flipflop_make_trans(x))
    assert trans.shape == x.shape
    # Each block's posterior transition distribution sums to 1.
    np.testing.assert_allclose(trans.sum(axis=2), 1.0, rtol=1e-4)

    # Brute force: enumerate paths, accumulate marginals.
    def allowed(f, t):
        return t < nbase or t == f or (f < nbase and t == f + nbase)

    probs = np.zeros_like(x)
    total = 0.0
    paths = [[s] for s in range(nbase)]  # start in flip states
    for _ in range(3):
        paths = [p + [n] for p in paths for n in range(2 * nbase)
                 if allowed(p[-1], n)]
    for p in paths:
        w = np.exp(sum(x[t, 0, tcode(p[t], p[t + 1], nbase)]
                       for t in range(3)))
        total += w
        for t in range(3):
            probs[t, 0, tcode(p[t], p[t + 1], nbase)] += w
    probs /= total
    np.testing.assert_allclose(trans, probs, rtol=2e-3, atol=1e-5)


def test_global_norm_makes_logz_zero():
    from taiyaki_tpu.ops.flipflop import flipflop_logz
    rng = np.random.default_rng(13)
    x = rng.normal(size=(5, 2, 40)).astype(np.float32)
    normed = decode.global_norm_flipflop(x)
    logz = np.asarray(flipflop_logz(normed))
    np.testing.assert_allclose(logz, 0.0, atol=1e-3)


def test_qchar_roundtrip():
    assert qscores.qchar_from_qscore([0.0]) == "!"
    assert qscores.qchar_from_qscore([20.0]) == "5"
    np.testing.assert_allclose(qscores.qscore_from_errprob(0.01), 20.0)


def test_transitions_into_base():
    cols = qscores.transitions_into_base(1, 4)
    assert len(cols) == 10  # 8 sources into flip + flip->flop + flop stay
    assert 2 * 16 + 1 in cols
    assert 2 * 16 + 5 in cols


def test_errprobs_from_trans_perfect_call():
    """If all posterior mass enters the called base, errprob ~ 0."""
    nbase = 4
    S = 40
    T = 3
    path = np.array([[0], [1], [1], [2]])  # moves A->C, stay, C->G
    trans = np.zeros((T, 1, S), dtype=np.float32)
    for t in range(T):
        trans[t, 0, tcode(path[t, 0], path[t + 1, 0], nbase)] = 1.0
    errp = qscores.errprobs_from_trans(trans, path)
    assert errp.shape == (T + 1, 1)
    assert errp[0, 0] == -1.0
    np.testing.assert_allclose(errp[1:, 0], 0.0, atol=1e-6)


def test_path_errprobs_to_qstring_skips_stays():
    path = np.array([0, 1, 1, 2])
    errprobs = np.array([-1.0, 0.01, 0.5, 0.01])
    q = qscores.path_errprobs_to_qstring(errprobs, path, 1.0, 0.0)
    assert len(q) == 2  # two moves, stay skipped
    assert q == "55"


def test_chunk_read_shapes():
    sig = np.arange(2500, dtype=np.float32)
    chunks, starts, ends = basecall_helpers.chunk_read(sig, 1000, 100)
    # stride = chunk - overlap = 900; last chunk snaps to the signal end
    assert chunks.shape == (1000, 3, 1)
    np.testing.assert_array_equal(starts, [0, 900, 1500])
    assert ends[-1] == 2500
    np.testing.assert_array_equal(ends - starts, 1000)
    # short signal: single untrimmed chunk
    chunks, starts, ends = basecall_helpers.chunk_read(sig[:500], 1000, 100)
    assert chunks.shape == (500, 1, 1)


def test_stitch_chunks_reconstructs_unique_blocks():
    """Stitching must produce exactly len(signal)//stride blocks with each
    block's value equal to its global block index."""
    stride = 5
    siglen, chunk_size, overlap = 5000, 1000, 200
    sig = np.zeros(siglen)
    chunks, starts, ends = basecall_helpers.chunk_read(
        sig, chunk_size, overlap)
    nblk = chunk_size // stride
    out = np.zeros((nblk, chunks.shape[1], 1), dtype=int)
    for i, s in enumerate(starts):
        out[:, i, 0] = s // stride + np.arange(nblk)
    stitched = basecall_helpers.stitch_chunks(out, starts, ends, stride)
    np.testing.assert_array_equal(stitched[:, 0],
                                  np.arange(siglen // stride))


def test_run_model_stitches_long_read():
    """basecall_helpers.run_model: chunk -> net -> stitch equals running
    the net on the whole read for a stride-compatible conv-only model."""
    import jax
    from taiyaki_tpu import layers, activation

    rng = np.random.default_rng(21)
    net = layers.Serial([layers.Convolution(1, 4, 1, stride=2,
                                            fun=activation.linear)])
    params = net.init(rng)
    signal = rng.normal(size=3000).astype(np.float32)
    whole = np.asarray(net.apply(params, signal[:, None, None]))[:, 0]
    stitched = basecall_helpers.run_model(
        signal, net, params, chunk_size=250, overlap=25,
        max_concur_chunks=4)
    assert stitched.shape == whole.shape
    np.testing.assert_allclose(stitched, whole, rtol=1e-5, atol=1e-6)
