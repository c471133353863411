"""taiyaki_tpu — TPU-native framework for training nanopore basecallers.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
nanoporetech/taiyaki (reference v5.3.0): flip-flop CRF basecaller training,
modified-base (cat_mod) models, squiggle prediction, remapping, decoding and
Guppy-compatible model export.

Compute path is JAX (jit/pjit/shard_map + Pallas kernels); data path is
host-side Python/C++. Tensor convention is time x batch x features (TBF),
matching the reference (taiyaki/layers.py:14).
"""

__version__ = "0.1.1"

# Model schema version written to / checked in checkpoints.  Mirrors the
# reference MODEL_VERSION = 3 (taiyaki/layers.py:19) so exported models
# interoperate.
MODEL_VERSION = 3
