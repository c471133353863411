"""Flip-flop coding utilities.

Host-side (numpy) helpers for converting base-label sequences into flip-flop
codes and transition-matrix indices, plus device-side (jnp) variants used
inside jitted loss functions.

Reference behavior: taiyaki/flipflopfings.py (move_indices :6, stay_indices
:20, flopmask :34, flipflop_code :56, path_to_str :81, extract_mod_weights
:100, nstate_flipflop :146, nbase_flipflop :171).

The flip-flop model over an alphabet of L bases has 2L states (a "flip" and a
"flop" copy of every base; within a run of the same base the state alternates
flip/flop).  The network emits one weight per allowed transition, laid out as
2L * (L+1) columns: block d in [0, L) holds transitions into flip base d from
each of the 2L states, and block L holds flip->flop (same base only) and
flop->flop stays.  Index formulas:

    move(from, to) = from + 2L * min(to, L)
    stay(s)        = s + 2L * min(s, L)
"""

import numpy as np

from taiyaki_tpu.constants import DEFAULT_ALPHABET, DEFAULT_NBASE


def move_indices(labels, nbase=DEFAULT_NBASE):
    """Transition indices for the moves along a flip-flop coded sequence.

    Args:
        labels: int array [nseqpos] of flip-flop codes (0..2*nbase-1).
        nbase: number of canonical bases.

    Returns:
        int array [nseqpos - 1] of indices into the 2*nbase*(nbase+1)
        transition vector for each move labels[i] -> labels[i+1].
    """
    labels = np.asarray(labels)
    nstate = 2 * nbase
    return labels[:-1] + np.minimum(labels[1:], nbase) * nstate


def stay_indices(labels, nbase=DEFAULT_NBASE):
    """Transition indices for staying at each position of a coded sequence."""
    labels = np.asarray(labels)
    nstate = 2 * nbase
    return labels + np.minimum(labels, nbase) * nstate


def flopmask(labels):
    """Mask of labels in even positions within runs of identical labels.

    Implementation: find the start index of the run containing each position,
    then mark positions an odd distance from their run start.

    Example: [1,3,2,3,3,3,3,1,1] -> [F,F,F,F,T,F,T,F,T]
    """
    labels = np.asarray(labels)
    n = len(labels)
    if n == 0:
        return np.zeros(0, dtype=bool)
    idx = np.arange(n)
    is_run_start = np.ones(n, dtype=bool)
    is_run_start[1:] = labels[1:] != labels[:-1]
    run_start = np.maximum.accumulate(np.where(is_run_start, idx, 0))
    return (idx - run_start) % 2 == 1


def flipflop_code(labels, alphabet_length=DEFAULT_NBASE):
    """Convert base labels to flip-flop codes.

    Adds alphabet_length to labels at even positions within runs of identical
    bases (the "flop" states).

    Example: [1,3,2,3,3,3,3,1,1] -> [1,3,2,3,7,3,7,1,5]
    """
    x = np.asarray(labels).copy()
    x[flopmask(x)] += alphabet_length
    return x


def path_to_str(path, alphabet=DEFAULT_ALPHABET, include_first_source=True):
    """Convert a flip-flop state path into a basecall string.

    Args:
        path: int vector of flip-flop states (0..2L-1).
        alphabet: alphabet string of length L.
        include_first_source: whether the source state of the first transition
            contributes a base.  Guppy does not include it; pass False for
            agreement with Guppy output.
    """
    path = np.asarray(path)
    move = np.ediff1d(path, to_begin=1 if include_first_source else 0) != 0
    lut = np.frombuffer((alphabet * 2).encode(), dtype="u1")
    return lut[path[move]].tobytes().decode()


def extract_mod_weights(mod_weights, path, can_nmods):
    """Extract per-basecall modified-base scores along a decoded path.

    Args:
        mod_weights: array [T, 1 + ncan + nmod... = sum(can_nmods + 1)] of raw
            mod score stream values per block.
        path: array [T + 1] of flip-flop states visited.
        can_nmods: array [ncan_base] with the number of mods per canonical
            base.

    Returns:
        array [len(basecall), sum(can_nmods)] of mod scores; NaN where a mod
        does not apply to the called base.  The first base is always
        unmodified (it is never "moved into").
    """
    path = np.asarray(path)
    ncan = len(can_nmods)
    nmod_total = int(np.sum(can_nmods))
    # Blocks where the state changed ("moved into" a new base); the entry at
    # t in `moved` refers to the transition from path[t] to path[t+1], and the
    # mod score stream for that transition lives at mod_weights[t].
    moved = path[1:] != path[:-1]
    called_states = path[1:][moved]          # state entered at each basecall
    called_scores = mod_weights[moved]       # [ncalls, stream width]
    ncalls = len(called_states)
    # Output column layout follows the alphabet's canonical grouping: all
    # mods of canonical base 0 first, then base 1, etc.
    out = np.full((ncalls + 1, nmod_total), np.nan)
    col = 0           # output column for the current mod
    stream_pos = 0    # position of a canonical-base group in the score stream
    for base_i in range(ncan):
        hits = np.nonzero(called_states % ncan == base_i)[0]
        for mod_i in range(can_nmods[base_i]):
            # Row 0 (the initial base, never moved into) stays NaN.
            out[hits + 1, col] = called_scores[hits, stream_pos + 1 + mod_i]
            col += 1
        stream_pos += 1 + can_nmods[base_i]
    return out


def path_mod_scores(path, mod_weights, can_nmods):
    """Per-basecall mod scores for a decoded path + block mod stream.

    Alignment contract (matches the cat_mod loss, ops/flipflop.py: the
    move INTO the state at path[t+1] is scored by output block t, the
    same block that scores the Viterbi transition trans[t]): the mod
    stream row for transition path[t]->path[t+1] is mod_weights[t].

    Args:
        path: [N] flip-flop states (path[0] = initial state).
        mod_weights: [>= N-1, stream] per-block raw mod scores.
        can_nmods: array of per-canonical-base mod counts.

    Returns:
        [ncalls, sum(can_nmods)] scores for the called bases EXCLUDING
        the initial base (matching path_to_str(...,
        include_first_source=False)); NaN where no mod applies.
    """
    n = len(path)
    return extract_mod_weights(
        mod_weights[:n - 1], path[:n], can_nmods)[1:]


def nstate_flipflop(nbase):
    """Number of transition weights emitted by a flip-flop network: 2L(L+1)."""
    return 2 * nbase * (nbase + 1)


def nbase_flipflop(nstate):
    """Inverse of nstate_flipflop; asserts nstate is valid."""
    nbase_f = np.sqrt(0.25 + 0.5 * np.float64(nstate)) - 0.5
    assert np.mod(nbase_f, 1) == 0, (
        "Number of states not valid for flip-flop model. "
        "nstates: {}\tconverted nbases: {}".format(nstate, nbase_f))
    return int(np.round(nbase_f))
