"""Pure-torch stand-in for the reference's unbuildable `taiyaki.ctc` module.

The reference trainer (/root/reference/bin/train_flipflop.py:172) calls
`ctc.crf_flipflop_loss(outputs, seqs, seqlens, sharpen)`, implemented as a
Cython extension (/root/reference/taiyaki/ctc/ctc.pyx:116-153) over the AVX2
C kernel (c_crf_flipflop.c).  That extension cannot be built in this
environment (no Cython), and the reference's pure-torch fallback
(taiyaki/loss.py:113-173, FlipFlopLoss) crashes under modern torch: its
`score[:, 1:] = logaddexp(move_score, score[:, 1:])` writes in place over a
tensor saved for logaddexp's backward, which torch >= 2.x rejects
("modified by an inplace operation") in both scripted and eager mode.

This module provides a numerically-equivalent pure-torch implementation of
the same lattice DP, written OUT-of-place so autograd differentiates it
exactly (autograd through logaddexp yields the same posterior-weighted
gradient the C forward-backward kernel computes).  Conventions match
ctc.pyx:116-153: the DP runs on `sharpfact * logprob`, per-read cost is
`-score / nblk`, and the returned loss is `cost / sharpfact`.

It is pinned against the reference C kernel's own self-test data
(c_crf_flipflop.c:520-697) in tests/test_ref_shim.py, via the same
tests/data/ref_ctc_selftest.npz fixture used to pin the JAX kernels.

Used by run_reference_trainer.py, which installs it as `taiyaki.ctc` via
sys.modules so the reference trainer itself runs unmodified.
"""

import numpy as np
import torch

NEG_LARGE = -1e30


def _build_indices(seqs_np, seqlens_np, nbase, flipflopfings):
    """Per-read stay/move transition indices, padded to the longest read.

    Uses the reference's own index builders (taiyaki/flipflopfings.py),
    exactly as ctc.pyx:126-134 does, so the lattice wiring is the
    reference's, not a reimplementation.
    """
    split = np.split(seqs_np, np.cumsum(seqlens_np[:-1]))
    nbatch = len(seqlens_np)
    maxlen = int(seqlens_np.max())
    stay = np.zeros((nbatch, maxlen), dtype=np.int64)
    move = np.zeros((nbatch, max(maxlen - 1, 1)), dtype=np.int64)
    for b, seq in enumerate(split):
        st = flipflopfings.stay_indices(seq, nbase)
        mv = flipflopfings.move_indices(seq, nbase)
        stay[b, : len(st)] = st
        move[b, : len(mv)] = mv
    return torch.from_numpy(stay), torch.from_numpy(move)


def crf_flipflop_loss(logprob, seqs, seqlens, sharpfact):
    """Flip-flop CRF path loss, differentiable, matching ctc.pyx semantics.

    Args:
        logprob: [nblk, nbatch, ntrans] transition scores (torch, any grad).
        seqs:    1-D concatenation of all per-read flip-flop label sequences.
        seqlens: [nbatch] lengths of the sequences inside `seqs`.
        sharpfact: sharpening factor (float).

    Returns:
        [nbatch] tensor: -forward_score(sharp * logprob) / (nblk * sharpfact).
        (The trainer adds flipflop_logpartition separately, as with the C
        kernel: train_flipflop.py:172-176.)
    """
    from taiyaki import flipflopfings  # the reference's own module

    sharpfact = float(sharpfact)
    lp = logprob.float() * sharpfact
    nblk, nbatch, ntrans = lp.shape
    nbase = flipflopfings.nbase_flipflop(ntrans)

    seqs_np = np.asarray(seqs.detach().cpu().numpy(), dtype=np.int64)
    seqlens_np = np.asarray(seqlens.detach().cpu().numpy(), dtype=np.int64)
    stay_idx, move_idx = _build_indices(
        seqs_np, seqlens_np, nbase, flipflopfings)

    fwd = lp.new_full((nbatch, int(seqlens_np.max())), NEG_LARGE)
    fwd[:, 0] = 0.0
    # Padding needs no mask: moves only flow left->right, so junk in padded
    # columns never reaches the per-read final column seqlen-1.
    for t in range(nblk):
        xt = lp[t]
        stay_sc = torch.gather(xt, 1, stay_idx) + fwd
        if move_idx.shape[1]:
            move_sc = torch.gather(xt, 1, move_idx) + fwd[:, :-1]
            fwd = torch.cat(
                [stay_sc[:, :1], torch.logaddexp(move_sc, stay_sc[:, 1:])],
                dim=1)
        else:
            fwd = stay_sc
    final = torch.from_numpy(seqlens_np - 1)[:, None]
    score = torch.gather(fwd, 1, final).squeeze(1)
    return -score / (nblk * sharpfact)


def cat_mod_flipflop_loss(logprob, seqs, seqlens, mod_cats, can_mods_offsets,
                          mod_cat_weights, sharpfact):
    """Categorical-mod flip-flop loss, matching ctc.pyx:258-312 semantics.

    A move to target position p+1 scores
        lp[moveidx] + modmovefact[p] * lp[40 + modmoveidx[p]]
    (c_cat_mod_flipflop.c): the canonical transition plus the weighted
    mod-category score column for the base being emitted.  Sharpening scales
    only the canonical transition columns (ctc.pyx:265-269), and the
    reference's gradient convention is d(cost)/d(scaled scores) even though
    the returned value is cost/sharpfact (ctc.pyx:304-312) — reproduced here
    with a straight-through value correction.
    """
    from taiyaki import flipflopfings

    sharpfact = float(sharpfact)
    nblk, nbatch, nstate = logprob.shape
    can_mods_offsets = np.asarray(can_mods_offsets, dtype=np.int64)
    ncan_state = nstate - int(can_mods_offsets[-1])
    nbase = flipflopfings.nbase_flipflop(ncan_state)

    trans_sharp = torch.ones(nstate, dtype=torch.float32)
    trans_sharp[:ncan_state] = sharpfact
    # Reference grad convention (ctc.pyx:305-312): gradient is the core DP
    # gradient AT the sharpened scores — no trans_sharp chain factor, no
    # /sharpfact division.  Straight-through the scaling (value-only):
    lp32 = logprob.float()
    lp = lp32 + (lp32 * trans_sharp - lp32).detach()

    seqs_np = np.asarray(seqs.detach().cpu().numpy(), dtype=np.int64)
    seqlens_np = np.asarray(seqlens.detach().cpu().numpy(), dtype=np.int64)
    mod_cats_np = np.asarray(mod_cats.detach().cpu().numpy(), dtype=np.int64)
    mod_cat_weights = np.asarray(mod_cat_weights, dtype=np.float32)

    stay_idx, move_idx = _build_indices(
        seqs_np, seqlens_np, nbase, flipflopfings)

    # Mod columns are indexed by TARGET position (ctc.pyx:287-292): the move
    # into position p+1 emits that position's base, whose mod-cat column is
    # ncan_state + can_mods_offsets[canonical_base] + mod_cat.
    split_seq = np.split(seqs_np, np.cumsum(seqlens_np[:-1]))
    split_mod = np.split(mod_cats_np, np.cumsum(seqlens_np[:-1]))
    maxmove = max(int(seqlens_np.max()) - 1, 1)
    modmove = np.zeros((nbatch, maxmove), dtype=np.int64)
    modfact = np.zeros((nbatch, maxmove), dtype=np.float32)
    for b, (seq, mc) in enumerate(zip(split_seq, split_mod)):
        mod_seq = can_mods_offsets[seq[1:] % nbase] + mc[1:]
        modmove[b, : len(mod_seq)] = ncan_state + mod_seq
        modfact[b, : len(mod_seq)] = mod_cat_weights[mod_seq]
    modmove_t = torch.from_numpy(modmove)
    modfact_t = torch.from_numpy(modfact)

    fwd = lp.new_full((nbatch, int(seqlens_np.max())), NEG_LARGE)
    fwd[:, 0] = 0.0
    for t in range(nblk):
        xt = lp[t]
        stay_sc = torch.gather(xt, 1, stay_idx) + fwd
        if move_idx.shape[1]:
            move_sc = (torch.gather(xt, 1, move_idx)
                       + modfact_t * torch.gather(xt, 1, modmove_t)
                       + fwd[:, :-1])
            fwd = torch.cat(
                [stay_sc[:, :1], torch.logaddexp(move_sc, stay_sc[:, 1:])],
                dim=1)
        else:
            fwd = stay_sc
    final = torch.from_numpy(seqlens_np - 1)[:, None]
    score = torch.gather(fwd, 1, final).squeeze(1)
    cost = -score / nblk
    # Value = cost/sharpfact, gradient = d(cost) (the reference convention).
    return cost + (cost / sharpfact - cost).detach()
