"""Remapping tests: global and glocal toy alignments with exactly known
scores/paths (mirrors the reference's test_flipflop_remap.py expectations),
plus from_remapping_path / get_reftosignal inversion at stride 1 and 2."""

import numpy as np

from taiyaki_tpu import flipflop_remap
from taiyaki_tpu.data.signal import Signal
from taiyaki_tpu.data.signal_mapping import SignalMapping


def test_global_remap_exact():
    # Sequence AABA over {A,B}; best path AaaBBAA scores exactly 6.
    sequence = "AABA"
    log_transitions = np.zeros((6, 12), dtype="f4")
    for t, col in enumerate([8, 10, 6, 5, 1, 0]):
        log_transitions[t, col] = 1.0
    score, path = flipflop_remap.flipflop_remap(
        log_transitions, sequence, alphabet="AB", localpen=-0.5)
    assert score == 6.0
    assert path.tolist() == [0, 1, 1, 2, 2, 3, 3]

    score2, path2 = flipflop_remap.map_to_crf_viterbi(
        log_transitions, [8, 6, 1], [0, 10, 5, 0], localpen=-0.5)
    assert score2 == score
    assert path2.tolist() == path.tolist()


def test_glocal_remap_clips_ends():
    # Sequence BA over {A,B}; best path --BA- scores 3.5 with localpen -0.5.
    sequence = "BA"
    log_transitions = np.zeros((5, 12), dtype="f4")
    log_transitions[2, 5] = 1.0  # BB stay
    log_transitions[3, 1] = 1.0  # BA step
    score, path = flipflop_remap.flipflop_remap(
        log_transitions, sequence, alphabet="AB", localpen=-0.5)
    assert score == 3.5
    assert path.tolist() == [-1, -1, 0, 0, 1, -1]


def test_from_remapping_path_stride1():
    sig = Signal(dacs=np.zeros(12))
    path = np.array([-1, 0, 0, 1, 1, 1, 3, 3, 3, 4, 4, 5, 6], dtype=np.int32)
    int_ref = SignalMapping.get_integer_reference("ACTACGT", "ACGT")
    rts = SignalMapping.from_remapping_path(path, int_ref, 1,
                                            sig).Ref_to_signal
    assert rts.tolist() == [0, 2, 5, 5, 8, 10, 11, 12]

    sig = Signal(dacs=np.zeros(15))
    path = np.array([-1, -1, 1, 1, 2, 2, 2, 4, 4, 4, 5, 5, 6, 7, -1, -1],
                    dtype=np.int32)
    int_ref = SignalMapping.get_integer_reference("AACTACGTTT", "ACGT")
    rts = SignalMapping.from_remapping_path(path, int_ref, 1,
                                            sig).Ref_to_signal
    assert rts.tolist() == [-1, 1, 3, 6, 6, 9, 11, 12, 13, 16, 16]


def test_from_remapping_path_stride2():
    sig = Signal(dacs=np.zeros(24))
    path = np.array([-1, 0, 0, 1, 1, 1, 3, 3, 3, 4, 4, 5, 6], dtype=np.int32)
    int_ref = SignalMapping.get_integer_reference("ACTACGT", "ACGT")
    rts = SignalMapping.from_remapping_path(path, int_ref, 2,
                                            sig).Ref_to_signal
    assert rts.tolist() == [1, 5, 11, 11, 17, 21, 23, 24]

    sig = Signal(dacs=np.zeros(30))
    path = np.array([-1, -1, 1, 1, 2, 2, 2, 4, 4, 4, 5, 5, 6, 7, -1, -1],
                    dtype=np.int32)
    int_ref = SignalMapping.get_integer_reference("AACTACGTTT", "ACGT")
    rts = SignalMapping.from_remapping_path(path, int_ref, 2,
                                            sig).Ref_to_signal
    assert rts.tolist() == [-1, 3, 7, 13, 13, 19, 23, 25, 26, 31, 31]


def test_remap_random_agrees_with_reference_impl():
    """Randomized cross-check against the reference implementation."""
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from taiyaki import flipflop_remap as ref_remap
    except ImportError:
        return
    rng = np.random.default_rng(99)
    for _ in range(20):
        L = int(rng.integers(3, 12))
        T = int(rng.integers(L + 1, 40))
        seq = "".join(rng.choice(list("ACGT"), L))
        scores = rng.normal(size=(T, 40)).astype("f4")
        for localpen in (1e30, 0.5, 2.0):
            s1, p1 = flipflop_remap.flipflop_remap(scores, seq,
                                                   localpen=localpen)
            try:
                s2, p2 = ref_remap.flipflop_remap(scores, seq,
                                                  localpen=localpen)
            except IndexError:
                # Reference bug: its traceback index is uint8 and wraps to
                # 255 when the glocal path exits early (flipflop_remap.py:85
                # "m -= move" underflow).  Our int-typed traceback handles
                # these alignments; nothing to compare against.
                continue
            assert abs(s1 - s2) < 1e-4, (s1, s2)
            assert p1.tolist() == p2.tolist()


def test_native_remap_matches_numpy():
    """The C++ remap Viterbi (decodeutil/remapviterbi.cpp) must
    reproduce the numpy reference loop — identical paths, scores to f32
    rounding (numpy 2's weak promotion makes the numpy loop's
    start/end-state accumulators np.float32 — `python-float +
    np.float32` — while the lattice itself is f64; the C++ kernel
    accumulates everything in f64, so scores differ at the f32 epsilon)
    — including glocal (finite localpen) clipping."""
    import os
    import numpy as np
    from taiyaki_tpu import decodeutil, flipflop_remap
    from taiyaki_tpu.constants import LARGE_VAL

    rng = np.random.default_rng(3)
    for localpen in (LARGE_VAL, 2.5):
        for trial in range(4):
            # M <= T keeps the alignment feasible: an infeasible one
            # scores -LARGE_VAL down both the lattice and the end state,
            # and which garbage branch the traceback picks then depends
            # on accumulator rounding (meaningless either way — callers
            # reject such reads on the score)
            T = int(rng.integers(20, 120))
            M = int(rng.integers(5, min(60, T)))
            scores = rng.normal(size=(T, 40)).astype(np.float32)
            stay_index = rng.integers(0, 40, size=M).astype(np.int32)
            step_index = rng.integers(0, 40, size=M - 1).astype(np.int32)
            os.environ["TAIYAKI_TPU_NO_NATIVE_REMAP"] = "1"
            try:
                score_np, path_np = flipflop_remap.map_to_crf_viterbi(
                    scores, step_index, stay_index, localpen=localpen)
            finally:
                del os.environ["TAIYAKI_TPU_NO_NATIVE_REMAP"]
            score_cc, path_cc = decodeutil.remap_viterbi(
                scores, stay_index, step_index, localpen)
            assert abs(score_cc - score_np) < 1e-5 * max(
                1.0, abs(score_np)), (localpen, trial)
            np.testing.assert_array_equal(path_cc, path_np)
