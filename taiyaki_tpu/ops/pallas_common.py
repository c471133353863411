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
    if os.environ.get("TAIYAKI_TPU_PALLAS_INTERPRET") == "1":
        _warn_interpret_once()
        return True
    return bool(flag)


_interpret_warned = False


def _warn_interpret_once():
    """One-time stderr notice when the test-only interpret override engages
    on a real TPU backend, where it silently costs orders of magnitude."""
    global _interpret_warned
    if _interpret_warned:
        return
    _interpret_warned = True
    try:
        import jax
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend not in ("cpu",):
        import sys
        sys.stderr.write(
            "taiyaki_tpu: TAIYAKI_TPU_PALLAS_INTERPRET=1 is forcing "
            "interpret-mode Pallas kernels on backend '{}' — this is a "
            "test-only switch and is orders of magnitude slower than "
            "compiled kernels.\n".format(backend))
