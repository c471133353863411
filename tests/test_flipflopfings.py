"""Tests for flip-flop coding utilities.

Expected values mirror the reference's documented examples
(taiyaki/flipflopfings.py docstrings) and index invariants
(taiyaki/ctc/ctc.pyx:126-134).
"""

import numpy as np
import pytest

from taiyaki_tpu import flipflopfings as ff


def test_flopmask_documented_example():
    x = np.array([1, 3, 2, 3, 3, 3, 3, 1, 1])
    expected = np.array(
        [False, False, False, False, True, False, True, False, True])
    np.testing.assert_array_equal(ff.flopmask(x), expected)


def test_flipflop_code_documented_example():
    x = np.array([1, 3, 2, 3, 3, 3, 3, 1, 1])
    expected = np.array([1, 3, 2, 3, 7, 3, 7, 1, 5])
    np.testing.assert_array_equal(ff.flipflop_code(x), expected)


def test_flopmask_run_lengths():
    # A run of n identical bases alternates flip/flop starting at flip.
    x = np.array([0] * 5)
    np.testing.assert_array_equal(
        ff.flopmask(x), [False, True, False, True, False])


def test_flopmask_empty():
    assert len(ff.flopmask(np.array([], dtype=int))) == 0


@pytest.mark.parametrize("nbase", [2, 4, 5])
def test_nstate_nbase_roundtrip(nbase):
    nstate = ff.nstate_flipflop(nbase)
    assert nstate == 2 * nbase * (nbase + 1)
    assert ff.nbase_flipflop(nstate) == nbase


def test_nbase_flipflop_invalid():
    with pytest.raises(AssertionError):
        ff.nbase_flipflop(41)


def test_move_stay_indices_in_range():
    rng = np.random.default_rng(42)
    nbase = 4
    labels = ff.flipflop_code(rng.integers(0, nbase, size=50))
    ntrans = ff.nstate_flipflop(nbase)
    moves = ff.move_indices(labels, nbase)
    stays = ff.stay_indices(labels, nbase)
    assert moves.shape == (49,)
    assert stays.shape == (50,)
    assert np.all((moves >= 0) & (moves < ntrans))
    assert np.all((stays >= 0) & (stays < ntrans))


def test_stay_indices_formula():
    nbase = 4
    # flip state f stays at index f + 2*nbase*f; flop state stays in block
    # 2*nbase*nbase.
    assert ff.stay_indices(np.array([1]), nbase)[0] == 1 + 8 * 1
    assert ff.stay_indices(np.array([5]), nbase)[0] == 5 + 8 * 4


def test_move_indices_formula():
    nbase = 4
    # move flip1 -> flip2: 1 + 8*2; move flip1 -> flop1 (code 5): 1 + 8*4
    assert ff.move_indices(np.array([1, 2]), nbase)[0] == 1 + 8 * 2
    assert ff.move_indices(np.array([1, 5]), nbase)[0] == 1 + 8 * 4


def test_path_to_str():
    # path through states: A(0) A(stay) C(1) C->flop... with ACGT alphabet
    path = np.array([0, 0, 1, 1, 5, 2])
    assert ff.path_to_str(path, include_first_source=True) == "ACCG"
    assert ff.path_to_str(path, include_first_source=False) == "CCG"


def test_path_to_str_flop_states_map_to_same_base():
    path = np.array([4, 5, 6, 7])
    assert ff.path_to_str(path) == "ACGT"


def test_extract_mod_weights():
    # 2 canonical bases, base 0 has 1 mod. Stream = [can, mod0A | can] width 3.
    can_nmods = np.array([1, 0])
    # path over flip-flop states for nbase=2: states 0..3
    path = np.array([0, 0, 1, 0, 2])  # stays then moves: calls at t=2,3,4
    T = len(path) - 1
    mod_weights = np.arange(T * 3, dtype=float).reshape(T, 3)
    out = ff.extract_mod_weights(mod_weights, path, can_nmods)
    # 3 moves -> 4 called bases (incl. initial), 1 mod column
    assert out.shape == (4, 1)
    # first base always NaN (unmodified)
    assert np.isnan(out[0, 0])
    # called states: path[1:][moved] = [1, 0, 2]; states %2==0 are base 0:
    # indices 1 (state 0) and 2 (state 2). Their scores at column 1 of the
    # stream rows where moves occurred (t=2 and t=3).
    assert np.isnan(out[1, 0])  # state 1 = base 1, no mods
    assert out[2, 0] == mod_weights[2, 1]
    assert out[3, 0] == mod_weights[3, 1]


def test_path_mod_scores_block_alignment():
    """The mod stream row for transition path[t] -> path[t+1] is
    mod_weights[t] — the block that also scores the Viterbi transition.
    Regression for the basecaller's one-block mod-score shift."""
    can_nmods = np.array([1, 0])
    # transitions: t0 move into state 1 (base 1, no mods), t1 stay,
    # t2 move into state 2 (flop of base 0, has a mod)
    path = np.array([0, 1, 1, 2])
    mod_weights = 10.0 * np.arange(9, dtype=float).reshape(3, 3) + 1
    out = ff.path_mod_scores(path, mod_weights, can_nmods)
    # called bases excluding the initial: state 1 then state 2
    assert out.shape == (2, 1)
    assert np.isnan(out[0, 0])                     # base 1 has no mods
    assert out[1, 0] == mod_weights[2, 1]          # block t=2, mod col
    # extra trailing mod rows (stitched stream longer than the path
    # consumes) must not shift anything
    longer = np.concatenate([mod_weights, 999 * np.ones((2, 3))])
    assert np.array_equal(
        ff.path_mod_scores(path, longer, can_nmods), out,
        equal_nan=True)
