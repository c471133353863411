"""Shared helpers for the Pallas TPU kernels (RNN, CRF, logZ)."""

import os

import jax

# Unrolled bodies with inlined dots HUNG the remote Mosaic compile at
# block_t=8; unrolling is verified safe (1s compiles, bit-identical
# results) only for 1-2 iteration loops.
MAX_UNROLL_BLOCK_T = 2


def run_steps(body, block_t, unroll):
    """Run a kernel's per-row time loop.  `unroll=True` means
    "statically unroll if safe": loops of <= MAX_UNROLL_BLOCK_T
    iterations are emitted inline (removing per-iteration loop
    machinery), longer ones always stay a rolled `fori_loop` — the
    guard lives HERE so no call site can request a compile-hanging
    unroll."""
    if unroll and block_t <= MAX_UNROLL_BLOCK_T:
        for j in range(block_t):
            body(j, 0)
    else:
        jax.lax.fori_loop(0, block_t, body, 0)


def interp(flag):
    """Resolve a kernel's `interpret` argument.

    TAIYAKI_TPU_PALLAS_INTERPRET=1 forces interpret mode at every
    pallas_call: together with the dispatch overrides in ops/rnn.py and
    ops/flipflop.py it lets the FULL Pallas code path (selection fusion,
    recompute backward, ...) run off-TPU — used by the mesh-sharding
    parity tests to pin that pallas_call partitions correctly inside a
    GSPMD-sharded jit on a multi-device mesh (read each call, not
    cached: tests toggle it per-case)."""
    return bool(flag) or os.environ.get(
        "TAIYAKI_TPU_PALLAS_INTERPRET") == "1"
