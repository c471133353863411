"""Device-side numerical ops (JAX / Pallas)."""

from taiyaki_tpu.ops.flipflop import (  # noqa: F401
    cat_mod_flipflop_loss,
    crf_flipflop_loss,
    flipflop_logz,
    log_partition_flipflop,
    make_seq_indices,
)
