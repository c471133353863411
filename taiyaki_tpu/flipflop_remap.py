"""Glocal Viterbi remapping: align transition scores to a known sequence.

Reference behavior: taiyaki/flipflop_remap.py (map_to_crf_viterbi :6-88,
flipflop_remap :91-142).  Used to build mapped-signal training data:
a remapping model's flip-flop transition scores for a whole read are
aligned against the read's known (collapsed) reference sequence.

The lattice has one column per sequence position plus "start"/"end" states;
staying in start/end costs `localpen` per block, so localpen = LARGE_VAL
forces global alignment and smaller values permit clipping ("glocal").
Blocks spent in start/end are marked -1 in the returned path.
"""

import os
import subprocess

import numpy as np

from taiyaki_tpu import flipflopfings
from taiyaki_tpu.constants import DEFAULT_ALPHABET, LARGE_VAL


def map_to_crf_viterbi(scores, step_index, stay_index, localpen=LARGE_VAL):
    """Best path through the (blocks x sequence-positions) lattice.

    Args:
        scores: [T, nstate] log-space transition scores.
        step_index: [M-1] score columns for moving to the next position.
        stay_index: [M] score columns for staying at each position.
        localpen: per-block cost of sitting in the start/end state.

    Returns:
        (best score, path [T+1] of sequence positions, -1 in start/end).
    """
    T = len(scores)
    M = len(stay_index)
    assert len(step_index) == M - 1

    # Real-length reads (T ~ 2e4, M ~ 1e4) take ~3 s/read in this numpy
    # loop — it dominated beam+fastq serving — vs ~0.1 s in the C++
    # kernel (decodeutil/remapviterbi.cpp, bit-compatible semantics,
    # pinned by tests).  The numpy path remains as reference/fallback.
    if os.environ.get("TAIYAKI_TPU_NO_NATIVE_REMAP") != "1":
        try:
            from taiyaki_tpu import decodeutil
            score, path = decodeutil.remap_viterbi(
                scores, stay_index, step_index, localpen)
            return score, path
        except (OSError, subprocess.CalledProcessError):
            pass  # no toolchain/build failure: numpy fallback below

    # Viterbi scores for the current/previous block-boundary.
    curr = np.full(M, -LARGE_VAL)
    curr[0] = 0.0
    start_score = 0.0
    end_score = -LARGE_VAL
    alignment_end = 0

    # Traceback: bit m of row t+1 says position m was entered by a *step*
    # (from m-1) rather than a stay.  Bit-packed to keep memory at T*M/8.
    traceback = np.zeros((T + 1, (M + 7) // 8), dtype=np.uint8)
    tb_row = np.zeros(M, dtype=np.uint8)

    for t in range(T):
        stay_sc = scores[t, stay_index]
        step_sc = scores[t, step_index]

        prev = curr
        stayed = prev + stay_sc
        stepped = prev[:-1] + step_sc

        # start state accrues the better of position-0's stay score and the
        # local penalty; leaving it into position 0 pays localpen.
        leave_start = start_score - localpen
        start_score = start_score + max(stay_sc[0], -localpen)

        curr = stayed.copy()
        better_step = stepped > stayed[1:]
        curr[1:] = np.where(better_step, stepped, stayed[1:])
        tb_row[:] = 0
        tb_row[1:] = better_step
        if start_score > curr[0]:
            curr[0] = start_score
        tb_row[0] = 1 if leave_start > stayed[0] else 0
        traceback[t + 1] = np.packbits(tb_row)

        # end state: keep sitting in end, or step in from the previous
        # boundary's final sequence position.
        remain_end = end_score + max(stay_sc[-1], -localpen)
        step_end = prev[-1] - localpen
        if step_end > remain_end:
            end_score = step_end
            alignment_end = t
        else:
            end_score = remain_end

    path = np.full(T + 1, -1, dtype=int)
    if curr[-1] > end_score:
        t, m = T, M - 1
    else:
        t, m = alignment_end, M - 1
    while t >= 0 and m >= 0:
        path[t] = m
        move = (traceback[t, m >> 3] >> (7 - (m & 7))) & 1
        m -= int(move)
        t -= 1
    return max(curr[-1], end_score), path


def flipflop_remap(transition_scores, sequence, alphabet=DEFAULT_ALPHABET,
                   localpen=LARGE_VAL):
    """Align flip-flop transition scores to a known sequence.

    Builds the stay/step score-column arrays for the flip-flop-coded
    sequence and runs the glocal Viterbi.

    Returns:
        (score, path [T+1]): path[t] is the sequence position occupied at
        block boundary t; -1 where the alignment sits in start/end.  The
        mapped span runs 0 .. len(sequence)-1 monotonically.
    """
    nbase = len(alphabet)
    # .find like the reference (flipflop_remap.py:132): an out-of-alphabet
    # base degrades (-1 wraps) instead of aborting the whole remap run
    bases = np.array([alphabet.find(b) for b in sequence])
    flops = flipflopfings.flopmask(bases)

    # Stay columns: flip b stays at b*(2*nbase)+b; flop stays in the final
    # block at (2*nbase+1)*nbase + b.
    stay_index = np.where(flops, bases + (2 * nbase + 1) * nbase,
                          bases + 2 * nbase * bases)
    from_state = (bases + flops * nbase)[:-1]
    to_block = np.maximum(bases, nbase * flops)[1:]
    step_index = from_state + 2 * nbase * to_block

    return map_to_crf_viterbi(transition_scores, step_index, stay_index,
                              localpen=localpen)
