"""Training stack: loss assembly, jitted/sharded train step, batching.

TPU-native redesign of bin/train_flipflop.py's hot path
(reference: bin/train_flipflop.py:145-212,532-627):

* The reference round-trips every batch GPU -> CPU (C loss kernel) -> GPU.
  Here the whole step — network forward, CRF loss, partition function,
  backward, clip, optimizer update — is ONE jitted XLA program that never
  leaves the device.
* Data parallelism is jit + NamedSharding over a ('data',) mesh: the batch
  axis is sharded, params/optimizer state are replicated, and XLA inserts
  the gradient all-reduce (psum) automatically — replacing DDP/NCCL.
* Variable chunk lengths are *bucketed* (multiples of stride over the
  configured range) so the number of distinct compiled programs is bounded;
  sequences are padded to a static per-bucket length derived from the
  path-buffer filter bound.
"""

from collections import namedtuple
import jax
import jax.numpy as jnp
import numpy as np
import optax

from taiyaki_tpu import flipflopfings
from taiyaki_tpu.data import chunk_selection
from taiyaki_tpu.ops import flipflop as ffops


# -- optimizer ---------------------------------------------------------------

def make_optimizer(lr_max, niteration, warmup_batches, lr_warmup, lr_min,
                   adam_betas=(0.9, 0.999), eps=1e-6, weight_decay=0.01,
                   min_momentum=None):
    """AdamW + one-cycle cosine LR, mirroring the reference's
    torch.optim.AdamW + OneCycleLR setup (bin/train_flipflop.py:406-429).

    min_momentum enables the reference's momentum cycling
    (OneCycleLR cycle_momentum: beta1 anneals INVERSELY to the LR, from
    adam_betas[0] down to min_momentum over the warmup and back over
    the decay).

    Returns:
        (optax GradientTransformation, schedule_fn)
    """
    if warmup_batches <= 0:
        # Degenerate one-cycle (pct_start=0 makes the warmup ramp 0/0 =
        # nan): no warmup means starting at the peak and decaying.
        schedule = optax.cosine_decay_schedule(
            init_value=lr_max, decay_steps=niteration,
            alpha=lr_min / lr_max)
    else:
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=niteration,
            peak_value=lr_max,
            pct_start=warmup_batches / niteration,
            div_factor=lr_max / lr_warmup,
            final_div_factor=lr_warmup / lr_min)
    if min_momentum is None:
        opt = optax.adamw(learning_rate=schedule, b1=adam_betas[0],
                          b2=adam_betas[1], eps=eps,
                          weight_decay=weight_decay)
    else:
        m_max, m_min = adam_betas[0], min_momentum
        warm = max(1, warmup_batches)
        decay_steps = max(1, niteration - warm)

        def b1_schedule(step):
            step = jnp.asarray(step, jnp.float32)
            up_frac = jnp.minimum(step / warm, 1.0)
            up = m_max + (m_min - m_max) * 0.5 * (
                1.0 - jnp.cos(jnp.pi * up_frac))
            down_frac = jnp.clip((step - warm) / decay_steps, 0.0, 1.0)
            down = m_min + (m_max - m_min) * 0.5 * (
                1.0 - jnp.cos(jnp.pi * down_frac))
            return jnp.where(step < warm, up, down)

        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=schedule, b1=b1_schedule, b2=adam_betas[1],
            eps=eps, weight_decay=weight_decay)
    return opt, schedule


def linear_ramp(start, final, niter):
    """Per-iteration linear schedule used for sharpen and mod_factor
    (reference: bin/train_flipflop.py:544-550)."""
    def value(curr_iter):
        return float(start + (final - start) * min(1.0, curr_iter / niter))
    return value


# -- gradient clipping -------------------------------------------------------

class GradientCapper:
    """Per-tensor clip-by-value at rolling median + n MADs of recent
    per-tensor gradient maxima (reference: bin/train_flipflop.py:201-212 +
    maths.RollingMAD).  Host-side state; thresholds are fed to the jitted
    step as an array."""

    def __init__(self, nparams, n_mads, window=1000):
        from taiyaki_tpu.maths import RollingMAD
        self.rolling_mads = (None if n_mads is None
                             else RollingMAD(nparams, n_mads, window))
        self._threshs = np.full(nparams, np.inf, dtype=np.float32)

    @property
    def thresholds(self):
        return self._threshs

    def update(self, grad_maxs):
        """Feed this step's per-tensor |grad| maxima; returns thresholds to
        use next step (inf until the stats window fills)."""
        if self.rolling_mads is None:
            return self._threshs
        out = self.rolling_mads.update(grad_maxs)
        if out is not None:
            self._threshs = np.asarray(out, dtype=np.float32)
        return self._threshs


# -- batch preparation -------------------------------------------------------

Batch = namedtuple("Batch", ("signal", "seqs", "seqlens", "mod_cats"))


def chunk_len_buckets(chunk_len_min, chunk_len_max, stride, nbuckets=8):
    """Fixed set of chunk lengths (multiples of stride) spanning the range.

    The reference draws a uniformly random multiple-of-stride length each
    iteration (bin/train_flipflop.py:552-557); sampling from a small fixed
    set preserves the length diversity while bounding XLA recompilation.
    """
    lo = max(stride, (chunk_len_min // stride) * stride)
    hi = max(lo, (chunk_len_max // stride) * stride)
    vals = np.unique(np.round(
        np.linspace(lo, hi, nbuckets) / stride).astype(np.int64) * stride)
    return [int(v) for v in vals]


def max_seqlen_for_chunk(chunk_len, stride, path_buffer=1.1):
    """Static padded sequence length for a chunk bucket.

    Chunks passing the path-buffer filter satisfy
    sig_len / (seq_len * stride) > path_buffer  =>  seq_len < bound.
    """
    return int(np.ceil(chunk_len / (stride * path_buffer)))


def bucket_seqlen(actual_max_seqlen, bound, granularity=128):
    """Bucketed static padding length for a batch's sequences.

    The CRF lattice kernels pad the sequence-position axis to multiples
    of 128 lanes, so 128 is the natural bucket granularity: each bucket
    is a genuinely distinct program shape.  Padding to the smallest
    bucket that fits the batch (instead of the worst-case path-buffer
    bound) removes lattice compute that would be spent on padding — on
    real data the mean-dwell filter keeps sequence lengths well under
    the bound (measured: chunk 4000 batches max out near 480 vs a bound
    of 728, a third of the lattice).  The reference instead sizes its
    DP buffers to the true batch max each iteration
    (taiyaki/ctc/ctc.pyx:126-134) — free for C on CPU, but on TPU every
    distinct shape is a compiled program, hence buckets.

    Returns min(bound, ceil(actual/granularity)*granularity), at least
    granularity.  granularity=None or 0 disables bucketing (returns
    bound).
    """
    if not granularity:
        return bound
    bucket = int(np.ceil(max(1, actual_max_seqlen) / granularity))
    return min(bound, max(granularity, bucket * granularity))


def sub_batch_size_for_chunk(min_sub_batch_size, chunk_len_max, chunk_len):
    """Size a sub-batch inversely to chunk length so memory stays constant
    (reference: bin/train_flipflop.py:558-563)."""
    return int(min_sub_batch_size * chunk_len_max / chunk_len + 0.5)


def prepare_batch(chunks, chunk_len, max_seqlen, alphabet_info,
                  reverse=False, can_labels=None, mod_labels=None):
    """Assemble sampled chunks into fixed-shape padded arrays.

    Args:
        chunks: accepted Chunk objects (sig_len == chunk_len each).
        chunk_len / max_seqlen: static shapes for this bucket.
        alphabet_info: for flip-flop coding.
        reverse: flip signal and sequence (RNA models).
        can_labels/mod_labels: cat_mod label conversion tables (or None).

    Returns:
        Batch(signal [chunk_len, n, 1] f32, seqs [n, max_seqlen] i32,
              seqlens [n] i32, mod_cats [n, max_seqlen] i32 or None)

    Chunks whose sequence exceeds max_seqlen are dropped (cannot happen when
    the path-buffer filter is active with the matching bound).
    """
    chunks = [c for c in chunks if c.seq_len <= max_seqlen]
    n = len(chunks)
    signal = np.zeros((chunk_len, n, 1), dtype=np.float32)
    seqs = np.zeros((n, max_seqlen), dtype=np.int32)
    seqlens = np.zeros(n, dtype=np.int32)
    is_mod = mod_labels is not None
    mod_cats = np.zeros((n, max_seqlen), dtype=np.int32) if is_mod else None
    revop = np.flip if reverse else np.asarray
    for i, chunk in enumerate(chunks):
        signal[:, i, 0] = revop(chunk.current)
        chunk_labels = revop(chunk.sequence)
        seqlens[i] = len(chunk_labels)
        if is_mod:
            mod_cats[i, :len(chunk_labels)] = mod_labels[chunk_labels]
            chunk_labels = can_labels[chunk_labels]
        coded = flipflopfings.flipflop_code(
            np.ascontiguousarray(chunk_labels), alphabet_info.ncan_base)
        seqs[i, :len(coded)] = coded
    return Batch(signal, seqs, seqlens, mod_cats)


def sample_batch(read_data, batch_chunk_len, sub_batch_size, max_seqlen,
                 alphabet_info, filter_params, reverse=False,
                 standardize=True, can_labels=None, mod_labels=None,
                 select_strands_randomly=True, first_strand_index=0,
                 log=None, seqlen_granularity=None, seqlen_reduce=None):
    """Sample + filter chunks and assemble a Batch
    (reference: bin/train_flipflop.py:78-142).

    seqlen_granularity, if set, pads sequences to the smallest multiple
    of it that fits the sampled batch instead of to max_seqlen (the
    path-buffer bound) — see bucket_seqlen.  The bucket choice is
    data-dependent and per-host: multihost runs must pass
    `seqlen_reduce`, a callable mapping this host's max sequence length
    to a cross-host agreed value (e.g. the global max — see
    bin/train_flipflop.py:_seqlen_sync), so every host pads to the same
    bucket.

    Returns:
        (Batch, rejection_counts)
    """
    chunk_batch, rejections = chunk_selection.sample_chunks(
        read_data, sub_batch_size, batch_chunk_len, filter_params,
        standardize=standardize,
        select_strands_randomly=select_strands_randomly,
        first_strand_index=first_strand_index)
    if len(chunk_batch) < sub_batch_size and log is not None:
        log.write("* Warning: only {} chunks passed filters (asked for "
                  "{}).\n".format(len(chunk_batch), sub_batch_size))
    if seqlen_granularity:
        actual = max((c.seq_len for c in chunk_batch), default=1)
        if seqlen_reduce is not None:
            actual = int(seqlen_reduce(actual))
        max_seqlen = bucket_seqlen(actual, max_seqlen, seqlen_granularity)
    batch = prepare_batch(chunk_batch, batch_chunk_len, max_seqlen,
                          alphabet_info, reverse=reverse,
                          can_labels=can_labels, mod_labels=mod_labels)
    return batch, rejections


# -- loss & step -------------------------------------------------------------

def make_loss_fn(net, is_cat_mod=False, can_mods_offsets=None,
                 mod_cat_weights=None):
    """Total training loss: CRF flip-flop loss + logZ / nblk, averaged over
    the batch (reference: bin/train_flipflop.py:162-186)."""

    def loss_fn(params, batch, sharpen, mod_factor=1.0):
        outputs = net.apply(params, batch.signal)
        nblk = outputs.shape[0]
        ntrans = outputs.shape[2]
        if is_cat_mod:
            ntrans = ntrans - int(can_mods_offsets[-1])
            lossvector = ffops.cat_mod_flipflop_loss(
                outputs, batch.seqs, batch.seqlens, batch.mod_cats,
                can_mods_offsets, mod_cat_weights * mod_factor, sharpen)
        else:
            lossvector = ffops.crf_flipflop_loss(
                outputs, batch.seqs, batch.seqlens, sharpen)
        # logZ masked like the CRF cost: a zero-length row would
        # otherwise contribute an unopposed -d(logZ) gradient (the
        # reference refuses such batches outright,
        # bin/train_flipflop.py:102-103; SignalMapping filters them)
        logz = ffops.flipflop_logz(outputs[:, :, :ntrans]) / nblk
        lossvector = lossvector + jnp.where(batch.seqlens > 0, logz, 0.0)
        # Mean over REAL rows only: seqlens == 0 marks padding added for
        # shape stability (bin/train_flipflop.py:_pad_batch).  For full
        # batches every row has seqlens > 0 and this equals jnp.mean.
        nvalid = jnp.maximum(jnp.sum(batch.seqlens > 0), 1)
        return jnp.sum(lossvector) / nvalid

    return loss_fn


def make_train_step(net, optimizer, is_cat_mod=False, can_mods_offsets=None,
                    mod_cat_weights=None):
    """Build the jittable full train step.

    step(params, opt_state, batch, sharpen, mod_factor, clip_threshs)
        -> (params, opt_state, loss, grad_maxs)

    clip_threshs: [nleaves] array of per-tensor |grad| caps (inf = no cap);
    grad_maxs: [nleaves] array of observed per-tensor |grad| maxima, fed to
    GradientCapper on the host.
    """
    loss_fn = make_loss_fn(net, is_cat_mod, can_mods_offsets,
                           mod_cat_weights)

    def step(params, opt_state, batch, sharpen, mod_factor, clip_threshs):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, batch, sharpen, mod_factor)
        leaves, treedef = jax.tree.flatten(grads)
        grad_maxs = jnp.stack([jnp.max(jnp.abs(g)) for g in leaves])
        clipped = [jnp.clip(g, -t, t)
                   for g, t in zip(leaves, clip_threshs)]
        grads = jax.tree.unflatten(treedef, clipped)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grad_maxs

    return step


def make_grad_step(net, is_cat_mod=False, can_mods_offsets=None,
                   mod_cat_weights=None):
    """Per-sub-batch (loss, grads) — the accumulation path for
    --sub_batches > 1.  The reference accumulates loss.backward() over
    sub-batches and steps the optimizer ONCE per iteration
    (bin/train_flipflop.py:152-195); stepping per sub-batch would burn
    the LR schedule sub_batches times too fast."""
    loss_fn = make_loss_fn(net, is_cat_mod, can_mods_offsets,
                           mod_cat_weights)

    def gstep(params, batch, sharpen, mod_factor):
        return jax.value_and_grad(loss_fn)(params, batch, sharpen,
                                           mod_factor)

    return gstep


def make_apply_step(optimizer):
    """Average accumulated grads over n_sub, then clip + update exactly
    as the fused step does (maxima measured pre-clip, reference
    apply_clipping order)."""

    def astep(params, opt_state, grads, n_sub, clip_threshs):
        grads = jax.tree.map(lambda g: g / n_sub, grads)
        leaves, treedef = jax.tree.flatten(grads)
        grad_maxs = jnp.stack([jnp.max(jnp.abs(g)) for g in leaves])
        clipped = [jnp.clip(g, -t, t)
                   for g, t in zip(leaves, clip_threshs)]
        grads = jax.tree.unflatten(treedef, clipped)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, grad_maxs

    return astep


def accumulate_grads(acc, grads):
    """Running on-device sum of gradient pytrees (one jitted dispatch)."""
    if acc is None:
        return grads
    return _tree_add(acc, grads)


@jax.jit
def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def jit_grad_step(gstep, mesh=None):
    """jit the per-sub-batch gradient step (see jit_train_step for the
    mesh semantics)."""
    if mesh is None:
        return jax.jit(gstep)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    batch_shard = Batch(
        signal=NamedSharding(mesh, P(None, "data", None)),
        seqs=NamedSharding(mesh, P("data", None)),
        seqlens=NamedSharding(mesh, P("data")),
        mod_cats=NamedSharding(mesh, P("data", None)),
    )
    return jax.jit(gstep,
                   in_shardings=(repl, batch_shard, None, None),
                   out_shardings=(repl, repl))


def jit_apply_step(astep, mesh=None):
    if mesh is None:
        return jax.jit(astep, donate_argnums=(0, 1, 2))
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    return jax.jit(astep,
                   in_shardings=(repl, repl, repl, None, repl),
                   out_shardings=(repl, repl, repl),
                   donate_argnums=(0, 1, 2))


def jit_train_step(step, mesh=None):
    """jit the step; when a mesh is given, shard the batch over its 'data'
    axis and replicate params/opt state.  XLA turns the gradient reduction
    into a psum over the mesh — the TPU equivalent of DDP's all-reduce
    (SURVEY.md §2.2)."""
    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    batch_shard = Batch(
        signal=NamedSharding(mesh, P(None, "data", None)),
        seqs=NamedSharding(mesh, P("data", None)),
        seqlens=NamedSharding(mesh, P("data")),
        mod_cats=NamedSharding(mesh, P("data", None)),
    )
    return jax.jit(
        step,
        in_shardings=(repl, repl, batch_shard, None, None, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1))


def shard_batch(batch, mesh):
    """Place host batch arrays onto the mesh with the training sharding.

    Single-process: a plain device_put of the full batch.  Multi-host:
    each process passes its LOCAL share of the global batch (global batch
    axis = local axis * process_count) and the shards are assembled into
    one global array — the TPU equivalent of DDP's per-rank data streams
    (SURVEY.md §2.2; reference bin/train_flipflop.py:266-268).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    nproc = jax.process_count()

    def put(x, spec):
        if x is None:
            return None
        sharding = NamedSharding(mesh, spec)
        if nproc == 1:
            return jax.device_put(x, sharding)
        global_shape = tuple(
            dim * nproc if axis < len(spec) and spec[axis] == "data"
            else dim for axis, dim in enumerate(x.shape))
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape)

    return Batch(put(batch.signal, P(None, "data", None)),
                 put(batch.seqs, P("data", None)),
                 put(batch.seqlens, P("data")),
                 put(batch.mod_cats, P("data", None)))
