"""Quality-score calculation for basecalls (reference: taiyaki/qscores.py).

Host-side numpy post-processing of posterior transition weights into
per-base error probabilities and Phred strings.
"""

import numpy as np

from taiyaki_tpu import flipflopfings
from taiyaki_tpu.constants import SMALL_VAL


def qchar_from_qscore(score, zerochar=33):
    """ASCII Phred encoding: chr(round(score) + zerochar)."""
    codes = (np.asarray(score) + zerochar + 0.5).astype(np.int8)
    return codes.tobytes().decode("ascii")


def qscore_from_errprob(errprob):
    """-10 log10(errprob)."""
    return -10.0 * np.log10(errprob)


def qchar_from_errprob(errprob, qscore_scale, qscore_offset):
    """Error prob -> calibrated Phred characters."""
    qscore = qscore_scale * qscore_from_errprob(errprob) + qscore_offset
    return qchar_from_qscore(qscore)


def transitions_into_base(b, nbases=4):
    """All transition-matrix column indices entering base b (flip or flop)
    (reference: qscores.py:58-85)."""
    colstart = 2 * nbases * b
    toflip = np.arange(colstart, colstart + 2 * nbases)
    fliptoflop = 2 * nbases * nbases + b
    return np.concatenate([toflip, [fliptoflop, fliptoflop + nbases]])


def errprobs_from_trans(trans, path):
    """Per-path-position error probabilities from posterior transition
    weights (reference: qscores.py:88-142).

        p[b] = P(transition into base at path[b]) / P(transition into any
        base); errprob = 1 - p.  Row 0 (never "moved into") is set to -1.

    Args:
        trans: [nblocks, batch, nstate] posterior transition probs (floats).
        path: [nblocks + 1, batch] int flip-flop states.

    Returns:
        [nblocks + 1, batch] float32 error probabilities (-1.0 in row 0).
    """
    trans = np.asarray(trans)
    path = np.asarray(path)
    nblocks, batchsize, nstate = trans.shape
    nbases = flipflopfings.nbase_flipflop(nstate)
    # Mask matrix [nstate, nbases]: column b sums transitions into base b.
    mask = np.zeros((nstate, nbases), dtype=trans.dtype)
    for b in range(nbases):
        mask[transitions_into_base(b, nbases), b] = 1.0
    baseprobs = trans @ mask                            # [nblk, batch, nb]
    baseprobs = baseprobs / (baseprobs.sum(axis=2, keepdims=True) + SMALL_VAL)

    p = np.empty(path.shape, dtype=np.float32)
    dest_base = path[1:] % nbases
    p[1:] = np.take_along_axis(baseprobs, dest_base[..., None],
                               axis=2)[..., 0]
    p[0] = 2.0
    return 1.0 - p


def path_errprobs_to_qstring(errprobs, path, qscore_scale, qscore_offset):
    """Quality string over emitted bases only (stays skipped; first source
    base skipped, matching include_first_source=False basecalls)."""
    errprobs = np.asarray(errprobs)
    path = np.asarray(path)
    filtered = errprobs[1:][path[1:] != path[:-1]]
    return qchar_from_errprob(filtered, qscore_scale, qscore_offset)
