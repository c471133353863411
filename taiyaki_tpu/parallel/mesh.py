"""Device mesh helpers for data-parallel training.

The framework's parallelism model (replacing the reference's
DDP/NCCL/torch.distributed.launch stack, SURVEY.md §2.2):

* one process per host drives all of that host's chips;
* the global batch axis is sharded over a 1-D ('data',) mesh spanning
  every chip in the job; parameters and optimizer state are replicated;
* XLA inserts the gradient all-reduce (psum over ICI within a slice, DCN
  between hosts) from the output shardings — there is no hand-written
  collective code;
* multi-host rendezvous is `jax.distributed.initialize()` (the trainer's
  --multihost flag), with per-host RNG seed offsets so hosts draw
  different data, mirroring the reference's per-rank seeding.
"""

import jax
import numpy as np


def data_mesh(devices=None):
    """A 1-D ('data',) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return jax.sharding.Mesh(np.asarray(devices).reshape(-1), ("data",))


def local_data_mesh():
    """Mesh over this host's chips only (single-host jobs)."""
    return data_mesh(jax.local_devices())


def round_batch_to_mesh(batch_size, mesh):
    """Largest multiple of the mesh size <= requested batch size (at
    least one row per device) — batches must divide evenly across the
    data axis, and callers treat batch_size as a capacity ceiling."""
    n = mesh.devices.size
    per = max(1, batch_size // n)
    return per * n
