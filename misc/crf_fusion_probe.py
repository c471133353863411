#!/usr/bin/env python3
"""On-chip probe: can the CRF score-selection one-hot GEMMs fuse into
the lattice kernels profitably?

The selection einsum `stay[t,b,l] = sum_s lp[t,b,s] * sel[b,l,s]` has a
DIFFERENT selector matrix per batch row, so an in-kernel fusion must
issue one [bt, S] x [S, L] matmul PER ROW per grid block (batched
dot_general; Mosaic serializes the batch dim).  Whether that wins is a
pipeline-fill question — M=block_t is tiny, so each row-dot pays the
MXU fill latency — against the HBM it saves (the [T,B,L] stay/move
streams in both directions plus the XLA einsum pass).

This probe times, at the production shape (T=800, B=256, L=512, S=40):
  A. the XLA selection einsum pair (status quo producer);
  B. a Pallas kernel that streams lp + per-row selectors and emits the
     two selected streams via in-kernel batched dots (the fusion's
     selection cost, isolated from the lattice walk);
  C. the same kernel body with the dots replaced by a stream copy
     (so B - C isolates the dot cost from the streaming cost).
If B - C exceeds the einsum + stream savings (~1.5 ms of the ~37 ms
step), the fusion loses and the negative result goes in
docs/performance.md with these numbers.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, B, L, S = 800, 256, 512, 40
BT = 8
BB = int(os.environ.get("PROBE_BB", "128"))


def sel_kernel(lp_ref, selstay_ref, selmove_ref, stay_ref, move_ref,
               *, with_dot):
    if not with_dot:
        # streaming-only baseline: touch inputs, write something the
        # compiler can't elide
        z = lp_ref[:].sum()
        stay_ref[:] = (jnp.zeros(stay_ref.shape, jnp.float32)
                       + z).astype(stay_ref.dtype)
        move_ref[:] = (jnp.ones(move_ref.shape, jnp.float32)
                       + z).astype(move_ref.dtype)
        return
    lp = lp_ref[:]                         # [BT, BB, S] f32
    # batched dot: batch dim = b -> [BB, BT, S] x [BB, S, L]
    lpb = jnp.transpose(lp, (1, 0, 2))
    dn = (((2,), (1,)), ((0,), (0,)))      # contract S, batch b
    stay = jax.lax.dot_general(lpb, selstay_ref[:], dn,
                               preferred_element_type=jnp.float32)
    move = jax.lax.dot_general(lpb, selmove_ref[:], dn,
                               preferred_element_type=jnp.float32)
    stay_ref[:] = jnp.transpose(stay, (1, 0, 2)).astype(stay_ref.dtype)
    move_ref[:] = jnp.transpose(move, (1, 0, 2)).astype(move_ref.dtype)


def build(with_dot):
    kernel = functools.partial(sel_kernel, with_dot=with_dot)
    imap = lambda ib, it: (it, ib, 0)
    smap = lambda ib, it: (ib, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(B // BB, T // BT),
        in_specs=[
            pl.BlockSpec((BT, BB, S), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, S, L), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, S, L), smap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, BB, L), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, BB, L), imap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, L), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, B, L), jnp.bfloat16),
        ],
    )


def timeit(fn, *args, iters=20):
    r = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), r)
    # reliable barrier: fetch a scalar that depends on the output
    float(jax.tree.leaves(r)[0][0, 0, 0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(jax.tree.leaves(r)[0][-1, -1, -1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    lp = jnp.asarray(rng.normal(size=(T, B, S)).astype(np.float32))
    idx_stay = rng.integers(0, S, size=(B, L))
    idx_move = rng.integers(0, S, size=(B, L))
    sel_stay = jax.nn.one_hot(idx_stay, S, dtype=jnp.float32)   # [B,L,S]
    sel_move = jax.nn.one_hot(idx_move, S, dtype=jnp.float32)
    selT_stay = jnp.asarray(np.transpose(np.asarray(sel_stay),
                                         (0, 2, 1)), jnp.bfloat16)
    selT_move = jnp.asarray(np.transpose(np.asarray(sel_move),
                                         (0, 2, 1)), jnp.bfloat16)

    @jax.jit
    def einsum_pair(lp, sel_stay, sel_move):
        stay = jnp.einsum("tbs,bls->tbl", lp, sel_stay,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        move = jnp.einsum("tbs,bls->tbl", lp, sel_move,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return stay.astype(jnp.bfloat16), move.astype(jnp.bfloat16)

    t_einsum = timeit(einsum_pair, lp, sel_stay, sel_move)
    print(f"A einsum pair (HIGHEST, XLA): {t_einsum:8.3f} ms")

    @jax.jit
    def einsum_pair_def(lp, sel_stay, sel_move):
        stay = jnp.einsum("tbs,bls->tbl", lp, sel_stay,
                          preferred_element_type=jnp.float32)
        move = jnp.einsum("tbs,bls->tbl", lp, sel_move,
                          preferred_element_type=jnp.float32)
        return stay.astype(jnp.bfloat16), move.astype(jnp.bfloat16)

    t_eins_def = timeit(einsum_pair_def, lp, sel_stay, sel_move)
    print(f"A' einsum pair (DEFAULT, XLA): {t_eins_def:8.3f} ms")

    copy = jax.jit(build(with_dot=False))
    try:
        t_copy = timeit(copy, lp, selT_stay, selT_move)
        print(f"C stream-only kernel:         {t_copy:8.3f} ms")
    except Exception as e:
        print("C failed:", str(e)[-300:])
        t_copy = None

    fused = jax.jit(build(with_dot=True))
    try:
        t_fused = timeit(fused, lp, selT_stay, selT_move)
        print(f"B batched-dot kernel:         {t_fused:8.3f} ms")
        if t_copy:
            print(f"  dot cost (B - C):           {t_fused - t_copy:8.3f} ms")
    except Exception as e:
        print("B failed:", str(e)[-600:])


if __name__ == "__main__":
    main()
