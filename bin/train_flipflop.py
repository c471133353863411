#!/usr/bin/env python3
"""Train a flip-flop basecaller network (canonical or modified-base) on TPU.

TPU-native re-design of the reference trainer (bin/train_flipflop.py):
the whole optimization step is one jitted XLA program; multi-chip data
parallelism is a jax mesh + sharded batch (no DDP/NCCL, no --local_rank —
one process drives all local chips; multi-host runs use --multihost and a
per-host seed offset mirroring the reference's seed + rank convention,
reference bin/train_flipflop.py:266-268).

Outputs (same contract as the reference, parsed by misc/plot_training.py):
  outdir/model.log        human-readable narrative + per-50-iteration stats
  outdir/batch.log        TSV: iter loss gradientmax gradientcap lr chunk_len
  outdir/validation.log   TSV: iter loss
  outdir/model_checkpoint_XXXXX.checkpoint (+ .params)
"""

import itertools
import os
import sys
import time
from collections import defaultdict, namedtuple
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bin._bin_argparse import get_train_flipflop_parser  # noqa: E402


MAIN_LOG_POLKA_TMPLT = (
    ' {:5d} {:7.5f}   {:5.2f}s ({:.2f} ksample/s {:.2f} kbase/s) '
    'lr={:.2e}')
MAIN_LOG_VAL_TMPLT = (
    'iteration: {} validation_loss: {:7.5f} ({:5.2} Mbase in {:5.2f} s, '
    '{:.2f} kbase/s)\n')
BATCH_FIELDS = ['iter', 'loss', 'gradientmax', 'gradientcap',
                'learning_rate', 'chunk_len']
BATCH_TMPLT = '\t'.join('{}' for _ in BATCH_FIELDS) + '\n'
VAL_TMPLT = '{}\t{}\n'

LOGS = namedtuple('LOGS', ('main', 'batch', 'validation'))


def main(args):
    if args.remat:
        # Trace-time flag read by layers.Serial.apply: wrap each layer
        # in jax.checkpoint (set before any jit trace happens).
        os.environ['TAIYAKI_TPU_REMAT'] = '1'
    # Heavy imports after argparse so --help is fast.
    import jax
    import jax.numpy as jnp
    from taiyaki_tpu import layers, train
    from taiyaki_tpu.constants import (
        BATCH_LOG_FILENAME, DOTROWLENGTH, MODEL_LOG_FILENAME,
        VALID_LOG_FILENAME)
    from taiyaki_tpu.data import mapped_signal_files
    from taiyaki_tpu.utils import helpers

    from taiyaki_tpu.utils.helpers import select_jax_platform
    select_jax_platform(args.device)
    if args.multihost:
        # Explicit rendezvous via env vars (for clusters JAX cannot
        # auto-detect); bare initialize() on TPU pods/Slurm/OpenMPI.
        init_kwargs = {}
        if 'TAIYAKI_COORDINATOR' in os.environ:
            init_kwargs = dict(
                coordinator_address=os.environ['TAIYAKI_COORDINATOR'],
                num_processes=int(os.environ['TAIYAKI_NUM_PROCS']),
                process_id=int(os.environ['TAIYAKI_PROC_ID']))
        jax.distributed.initialize(**init_kwargs)
    is_lead = jax.process_index() == 0

    if is_lead:
        helpers.prepare_outdir(args.outdir, args.overwrite)
    logs = LOGS(
        main=helpers.Logger(
            os.path.join(args.outdir, MODEL_LOG_FILENAME) if is_lead
            else None, args.quiet),
        batch=helpers.Logger(
            os.path.join(args.outdir, BATCH_LOG_FILENAME) if is_lead
            else None, quiet=True),
        validation=helpers.Logger(
            os.path.join(args.outdir, VALID_LOG_FILENAME) if is_lead
            else None, quiet=True))
    logs.main.write(helpers.formatted_env_info(args.device))
    logs.batch.write(BATCH_TMPLT.format(*BATCH_FIELDS))
    logs.validation.write(VAL_TMPLT.format('iter', 'loss'))

    seed = (np.random.randint(0, 2 ** 31) if args.seed is None
            else args.seed)
    if args.multihost:
        # All hosts must agree on the base seed (it drives model init,
        # validation holdout and the per-iteration chunk-length schedule).
        from jax.experimental import multihost_utils
        seed = int(multihost_utils.broadcast_one_to_all(
            np.asarray(seed, np.int64)))
    seqlen_reducer = None
    if args.multihost and args.seqlen_buckets and jax.process_count() > 1:
        # Must run here on the main thread (it broadcasts the server's
        # ephemeral port with a device collective); afterwards the
        # prefetch thread reduces over plain sockets only.
        from taiyaki_tpu.utils import hostsync
        seqlen_reducer, _seqlen_server = hostsync.start()
    # Shared setup stream: every host computes identical params, mod
    # weights, filter parameters and validation holdout.  The stream is
    # re-seeded with a per-host offset just before training so hosts draw
    # different chunks (reference seed + rank, train_flipflop.py:268).
    np.random.seed(seed)
    rng = np.random.default_rng(seed)
    # Shared chunk-length schedule: all hosts must pick the SAME bucket
    # each iteration or the global batch shapes disagree.
    bucket_rng = np.random.default_rng(2 ** 32 + seed)
    logs.main.write('* Using random seed {}\n'.format(seed))

    # ---- data ---------------------------------------------------------------
    logs.main.write('* Loading data from {}\n'.format(args.input))
    logs.main.write('* Per read file MD5 {}\n'.format(
        helpers.file_md5(args.input)))
    with mapped_signal_files.MappedSignalReader(args.input) as msr:
        alphabet_info = msr.get_alphabet_information()
        if args.input_strand_list is not None:
            from taiyaki_tpu.utils.fileio import readtsv
            read_ids = list(readtsv(args.input_strand_list,
                                    ['read_id'])['read_id'])
            logs.main.write('* Will train from a subset of {} strands, '
                            'determined by read_ids in input strand '
                            'list\n'.format(len(read_ids)))
        else:
            read_ids = None
        read_data = list(msr.reads(read_ids))
        if args.limit is not None:
            read_data = read_data[:args.limit]
    if len(read_data) == 0:
        logs.main.write('* No reads remaining for training, exiting.\n')
        sys.exit(1)
    logs.main.write('* Loaded {} reads.\n'.format(len(read_data)))
    logs.main.write('* Reading network from {}\n'.format(args.model))

    # ---- network ------------------------------------------------------------
    model_kwargs = {
        'size': args.size, 'stride': args.stride, 'winlen': args.winlen,
        'insize': 1, 'alphabet_info': alphabet_info}
    model_metadata = {'reverse': args.reverse,
                      'standardize': args.standardize}
    net, params, model_source, metadata, model_kwargs, opt_state_ckpt = \
        helpers.load_model(args.model, model_metadata=model_metadata,
                           **model_kwargs)
    if params is None:
        params = net.init(rng)
    is_cat_mod = layers.is_cat_mod_model(net)
    if is_cat_mod:
        head = net.sublayers[-1]
        assert alphabet_info.is_compatible_model(net), (
            'Model alphabet does not match mapped signal file alphabet')
        can_mods_offsets = head.can_mods_offsets
        can_labels, mod_labels = head.can_labels, head.mod_labels
        if args.mod_prior_factor is None:
            mod_cat_weights = np.ones(head.ncan_base + head.nmod_base,
                                      dtype=np.float32)
        else:
            # log-odds priors, as the reference trainer computes them
            # (bin/train_flipflop.py:312-326; NOT the inv-freq variant,
            # which the reference ships but does not use here)
            mod_cat_weights = alphabet_info.compute_log_odds_weights(
                read_data, args.num_mod_weight_reads)
            logs.main.write(
                '* Computed modbase log odds priors:  {}\n'.format(
                    '  '.join('{}:{:.4f}'.format(*x) for x in
                              zip(alphabet_info.alphabet,
                                  mod_cat_weights))))
            if args.mod_prior_factor != 1.0:
                mod_cat_weights = np.power(mod_cat_weights,
                                           args.mod_prior_factor)
                logs.main.write(
                    '* Applied mod_prior_factor to modbase log odds '
                    'priors:  {}\n'.format(
                        '  '.join('{}:{:.4f}'.format(*x) for x in
                                  zip(alphabet_info.alphabet,
                                      mod_cat_weights))))
    else:
        assert alphabet_info.nbase == net.sublayers[-1].nbase, (
            'Number of bases in alphabet does not match model')
        can_mods_offsets = can_labels = mod_labels = None
        mod_cat_weights = None
    stride = net.stride
    logs.main.write('* Network has {} parameter tensors, stride {}.\n'
                    .format(len(jax.tree.leaves(params)), stride))

    # ---- optimizer ----------------------------------------------------------
    lr_warmup = args.lr_min if args.lr_warmup is None else args.lr_warmup
    if args.warmup_batches >= args.niteration:
        sys.exit('* Error: --warmup_batches must be < --niteration')
    if args.chunk_len_min > args.chunk_len_max:
        # reference rejects this too (train_flipflop.py:247-249); without
        # the check the bucket schedule silently collapses
        sys.exit('* Error: --chunk_len_min greater than --chunk_len_max')
    optimizer, schedule = train.make_optimizer(
        args.lr_max, args.niteration, args.warmup_batches, lr_warmup,
        args.lr_min, adam_betas=tuple(args.adam), eps=args.eps,
        weight_decay=args.weight_decay, min_momentum=args.min_momentum)
    if args.min_momentum is not None:
        logs.main.write(
            '* Momentum cycling between {} and {} (inverse to LR).\n'
            .format(args.adam[0], args.min_momentum))
    opt_state = optimizer.init(params) if opt_state_ckpt is None \
        else opt_state_ckpt
    logs.main.write(
        '* Learning rate increases from {:.2e} to {:.2e} over {} '
        'iterations using cosine schedule.\n'.format(
            lr_warmup, args.lr_max, args.warmup_batches))
    logs.main.write(
        '* Then learning rate decreases from {:.2e} to {:.2e} over {} '
        'iterations using cosine schedule.\n'.format(
            args.lr_max, args.lr_min,
            args.niteration - args.warmup_batches))

    nleaves = len(jax.tree.leaves(params))
    capper = train.GradientCapper(nleaves, args.gradient_clip_num_mads)
    if args.gradient_clip_num_mads is None:
        logs.main.write('* No gradient clipping\n')
    else:
        logs.main.write(
            '* Gradients will be clipped (by value) at {:3.2f} MADs above '
            'the median of the last 1000 gradient maximums.\n'.format(
                args.gradient_clip_num_mads))

    # ---- mesh ---------------------------------------------------------------
    ndev = jax.device_count()   # global: multihost jobs have 1+ chip/host
    mesh = None
    if ndev > 1:
        mesh = jax.sharding.Mesh(
            np.array(jax.devices()).reshape(-1), ('data',))
        logs.main.write(
            '* Data-parallel over {} devices on {} hosts.\n'.format(
                jax.device_count(), jax.process_count()))
    step_fn = train.jit_train_step(
        train.make_train_step(net, optimizer, is_cat_mod, can_mods_offsets,
                              mod_cat_weights), mesh)
    if args.sub_batches > 1:
        # gradient ACCUMULATION over sub-batches, one optimizer step per
        # iteration (reference bin/train_flipflop.py:152-195; stepping
        # per sub-batch would burn the LR schedule sub_batches too fast)
        grad_fn = train.jit_grad_step(
            train.make_grad_step(net, is_cat_mod, can_mods_offsets,
                                 mod_cat_weights), mesh)
        apply_fn = train.jit_apply_step(
            train.make_apply_step(optimizer), mesh)

    # ---- filters & reporting data ------------------------------------------
    logs.main.write('* Estimating filter parameters from training data\n')
    from taiyaki_tpu.data import chunk_selection
    filter_params = chunk_selection.sample_filter_parameters(
        read_data, args.sample_nreads_before_filtering, args.chunk_len_max,
        args.filter_mean_dwell, args.filter_max_dwell,
        args.filter_min_pass_fraction, stride, args.filter_path_buffer)
    logs.main.write(
        '* Sampled chunks: median(mean_dwell)={:.2f}, '
        'mad(mean_dwell)={:.2f}\n'.format(
            filter_params.median_meandwell, filter_params.mad_meandwell))

    # Hold out reporting strands (reference :486-521).
    if args.reporting_strand_list is not None:
        from taiyaki_tpu.utils.fileio import readtsv
        reporting_ids = set(
            str(v) for v in readtsv(args.reporting_strand_list,
                                    ["read_id"])["read_id"])
        report_idx = set(i for i, r in enumerate(read_data)
                         if r.read_id in reporting_ids)
        logs.main.write('* Reporting strands from {} ({} found).\n'.format(
            args.reporting_strand_list, len(report_idx)))
    else:
        n_report = max(1, int(len(read_data) * args.reporting_percent_reads
                              / 100.0))
        report_idx = set(np.random.choice(len(read_data), n_report,
                                          replace=False))
    reporting_data = [read_data[i] for i in sorted(report_idx)]
    if not args.include_reporting_strands:
        read_data = [r for i, r in enumerate(read_data)
                     if i not in report_idx]
        logs.main.write('* Holding out {} reads for validation, training '
                        'on {}.\n'.format(len(reporting_data),
                                          len(read_data)))

    buckets = train.chunk_len_buckets(
        args.chunk_len_min, args.chunk_len_max, stride,
        args.chunk_len_buckets)
    logs.main.write('* Chunk length buckets: {}\n'.format(buckets))

    # Frozen validation batches: --reporting_sub_batches of them
    # (verbatim, as the reference's target_sub_batches), of
    # min_sub_batch_size chunks at the bucket nearest the reference's
    # (min+max)/2 reporting chunk length, walking the held-out strands
    # sequentially by attempts consumed (train_flipflop.py:88-96,510-514).
    mid_len = (args.chunk_len_min + args.chunk_len_max) // 2
    val_chunk_len = min(buckets, key=lambda b: abs(b - mid_len))
    val_max_seqlen = train.max_seqlen_for_chunk(
        val_chunk_len, stride, args.filter_path_buffer)
    reporting_batches = []
    first_strand = 0
    for i in range(args.reporting_sub_batches):
        vb, vrej = train.sample_batch(
            reporting_data, val_chunk_len, args.min_sub_batch_size,
            val_max_seqlen, alphabet_info, filter_params,
            reverse=args.reverse, standardize=args.standardize,
            can_labels=can_labels, mod_labels=mod_labels,
            select_strands_randomly=False, first_strand_index=first_strand,
            # all hosts draw identical validation chunks (common seed
            # until the per-host offset at :359), so the data-dependent
            # bucket choice is host-consistent without synchronization
            seqlen_granularity=(128 if args.seqlen_buckets else None))
        first_strand += sum(vrej.values())
        if vb.signal.shape[1] > 0:
            reporting_batches.append(vb)

    loss_fn = train.make_loss_fn(net, is_cat_mod, can_mods_offsets,
                                 mod_cat_weights)
    eval_loss = jax.jit(loss_fn, static_argnums=())

    sharpen_sched = train.linear_ramp(args.sharpen.min, args.sharpen.max,
                                      args.sharpen.niter)
    mod_factor_sched = train.linear_ramp(
        args.mod_factor.start, args.mod_factor.final, args.mod_factor.niter)

    # ---- training loop ------------------------------------------------------
    score_smoothed = helpers.WindowedExpSmoother()
    rejection_dict = defaultdict(int)
    total_bases = total_samples = 0

    sample_counter = itertools.count()

    def sample_iteration():
        """Sample and stage all of one iteration's sub-batches (host work).

        Runs on the single prefetch worker so chunk selection for iteration
        i+1 overlaps the device step for iteration i; a lone worker also
        keeps the np.random stream sequential, so --seed stays
        reproducible.
        """
        batch_chunk_len = buckets[bucket_rng.integers(len(buckets))]
        sub_batch_size = train.sub_batch_size_for_chunk(
            args.min_sub_batch_size, args.chunk_len_max, batch_chunk_len)
        nproc = jax.process_count()
        if mesh is not None:
            # round to multiple of device count for even sharding
            per = max(1, sub_batch_size // jax.device_count())
            sub_batch_size = per * jax.device_count()
        # each host samples only its share of the global batch
        local_batch_size = sub_batch_size // nproc
        max_seqlen = train.max_seqlen_for_chunk(
            batch_chunk_len, stride, args.filter_path_buffer)
        # data-dependent padding buckets need all hosts to agree on
        # shapes; multihost runs reduce the sampled max across hosts
        # (single-host measured +11% from bucketing, commit f867e90)
        seqlen_gran = 128 if args.seqlen_buckets else None
        it_idx = next(sample_counter)
        batches = []
        rejections_total = defaultdict(int)
        sample_count = base_count = 0
        for sub in range(args.sub_batches):
            reduce_fn = (_seqlen_sync(seqlen_reducer,
                                      '%d.%d' % (it_idx, sub))
                         if (seqlen_gran and seqlen_reducer is not None)
                         else None)
            batch, rejections = train.sample_batch(
                read_data, batch_chunk_len, local_batch_size, max_seqlen,
                alphabet_info, filter_params, reverse=args.reverse,
                standardize=args.standardize, can_labels=can_labels,
                mod_labels=mod_labels, log=logs.main,
                seqlen_granularity=seqlen_gran, seqlen_reduce=reduce_fn)
            for k, v in rejections.items():
                rejections_total[k] += v
            if batch.signal.shape[1] < local_batch_size:
                # pad batch to static size with repeats for shape stability
                batch = _pad_batch(batch, local_batch_size)
            # account samples/bases HERE, while the batch is still host
            # numpy: summing a device-sharded seqlens in the train loop
            # would enqueue an eager reduction behind the just-dispatched
            # step and block on it, serializing the fetch pipeline
            sample_count += int(batch.signal.size)
            base_count += int(np.sum(batch.seqlens))
            if mesh is not None:
                batch = train.shard_batch(batch, mesh)
            batches.append(batch)
        return (batch_chunk_len, batches, rejections_total,
                (sample_count, base_count))

    # From here on the global stream draws training chunks: offset it per
    # host so hosts sample different data (reference :268).
    np.random.seed(seed + jax.process_index())
    prefetch = ThreadPoolExecutor(max_workers=1)
    next_batches = prefetch.submit(sample_iteration)
    time_last = time.time()
    logs.main.write('* Training\n')

    # One-step-delayed fetch pipeline: iteration k's loss/grad_maxs are
    # device handles consumed while iteration k+1 runs on the device, so
    # the two per-iteration device->host RPCs (which have a fixed
    # per-call latency floor on remote-execution runtimes) overlap the
    # next step instead of serializing between steps.  Cost: the
    # gradient capper's rolling-MAD window lags one step (immaterial for
    # a 1000-sample window, and exactly inf until the window fills), and
    # the non-finite-loss guard fires one iteration late.
    pending = None

    def process_iteration(p):
        nonlocal total_samples, total_bases, time_last
        it = p['iter']
        # ONE transfer call for all of the iteration's scalars: separate
        # float(loss) / np.asarray(grad_maxs) fetches each pay the
        # per-RPC latency floor and cost +52% ms/step at the production
        # config; a single device_get is measured at the chained-dispatch
        # ceiling (misc/fetch_overlap_probe.py, docs/performance.md).
        losses_np, grad_maxs_np = jax.device_get(
            (p['losses'], p['grad_maxs']))
        fval = float(sum(losses_np)) / args.sub_batches
        if not np.isfinite(fval):
            # Numerical-health guard (reference: ctc.pyx:62-65 advice).
            # Divergence began at or before the reported iteration (the
            # pipelined fetch is one step delayed).
            logs.main.write(
                '\n* Error: loss is not finite at iteration {}.\n'
                '* Try restarting from a checkpoint with a lower learning '
                'rate.\n'.format(it + 1))
            sys.exit(1)
        grad_maxs_np = np.asarray(grad_maxs_np)
        capper.update(grad_maxs_np)
        if is_lead:
            logs.batch.write(BATCH_TMPLT.format(
                it + 1, fval,
                ','.join(str(float(g)) for g in grad_maxs_np),
                ','.join('NA' if not np.isfinite(t) else str(float(t))
                         for t in p['threshs']),
                float(schedule(it)), p['chunk_len']))
        score_smoothed.update(fval)
        logs.main.write('.')
        total_samples += p['samples']
        total_bases += p['bases']
        if (it + 1) % DOTROWLENGTH == 0:
            dt = time.time() - time_last
            logs.main.write(MAIN_LOG_POLKA_TMPLT.format(
                (it + 1) // DOTROWLENGTH, score_smoothed.value, dt,
                total_samples / 1000.0 / dt, total_bases / 1000.0 / dt,
                float(schedule(it))))
            if args.full_filter_status:
                for k, v in rejection_dict.items():
                    logs.main.write(' {}:{} '.format(k, v))
            else:
                n_tot = sum(rejection_dict.values())
                n_fail = n_tot - rejection_dict['pass']
                logs.main.write('  {:.1%} chunks filtered'.format(
                    n_fail / max(n_tot, 1)))
            logs.main.write('\n')
            time_last = time.time()
            total_bases = total_samples = 0

    for curr_iter in range(args.niteration):
        if args.profile and curr_iter == 10:
            jax.profiler.start_trace(os.path.join(args.outdir, 'profile'))
        if args.profile and curr_iter == 15:
            jax.profiler.stop_trace()
            logs.main.write('* Profiler trace written to {}/profile\n'
                            .format(args.outdir))
        sharpen = sharpen_sched(curr_iter)
        mod_factor = mod_factor_sched(curr_iter)
        (batch_chunk_len, batches, rejections,
         (iter_samples, iter_bases)) = next_batches.result()
        if curr_iter + 1 < args.niteration:
            next_batches = prefetch.submit(sample_iteration)
        for k, v in rejections.items():
            rejection_dict[k] += v

        losses = []
        used_threshs = capper.thresholds.copy()
        if args.sub_batches == 1:
            for batch in batches:
                params, opt_state, loss, grad_maxs = step_fn(
                    params, opt_state, batch, sharpen, mod_factor,
                    jnp.asarray(used_threshs))
                losses.append(loss)
        else:
            acc = None
            for batch in batches:
                loss, grads = grad_fn(params, batch, sharpen, mod_factor)
                acc = train.accumulate_grads(acc, grads)
                losses.append(loss)
            params, opt_state, grad_maxs = apply_fn(
                params, opt_state, acc, float(args.sub_batches),
                jnp.asarray(used_threshs))

        # consume the PREVIOUS iteration's results while this one runs
        if pending is not None:
            process_iteration(pending)
        pending = dict(iter=curr_iter, losses=losses, grad_maxs=grad_maxs,
                       threshs=used_threshs, chunk_len=batch_chunk_len,
                       samples=iter_samples, bases=iter_bases)

        if (curr_iter + 1) % args.save_every == 0:
            # flush the pipeline so the checkpoint's log lines land
            # after this iteration's batch line, exactly as before the
            # pipelined fetches.  Unconditional (not is_lead-gated):
            # capper updates must stay in lockstep across hosts — the
            # thresholds feed the next step's clipping on every host.
            if pending is not None:
                process_iteration(pending)
                pending = None
        if (curr_iter + 1) % args.save_every == 0 and is_lead:
            saved = helpers.save_model(
                args.outdir, net, params, model_source, model_kwargs,
                metadata, (curr_iter + 1) // args.save_every,
                optimizer_state=jax.tree.map(np.asarray, opt_state))
            logs.main.write('Model saved to {}.\n'.format(saved))
            t0 = time.time()
            vlosses, vbases = [], 0
            for vb in reporting_batches:
                vlosses.append(float(eval_loss(
                    params, vb, args.sharpen.max, args.mod_factor.final)))
                vbases += int(np.sum(vb.seqlens))
            rloss = float(np.mean(vlosses)) if vlosses else float('nan')
            dt = time.time() - t0
            logs.main.write(MAIN_LOG_VAL_TMPLT.format(
                curr_iter + 1, rloss, vbases / 1e6, dt, vbases / 1e3 / dt))
            logs.validation.write(VAL_TMPLT.format(curr_iter + 1, rloss))
            # reset the polka counters WITH the clock: resetting only
            # time_last would divide a full row's samples by the
            # time-since-validation, inflating the next row's ksample/s
            # (the reference avoids this by rounding save_every up to a
            # DOTROWLENGTH multiple, reference bin/train_flipflop.py:240)
            total_bases = total_samples = 0
            time_last = time.time()

    if pending is not None:
        process_iteration(pending)
        pending = None
    prefetch.shutdown(wait=False)
    if args.profile and 10 < args.niteration <= 15:
        jax.profiler.stop_trace()
        logs.main.write('* Profiler trace written to {}/profile\n'
                        .format(args.outdir))
    if is_lead:
        helpers.save_model(args.outdir, net, params, model_source,
                           model_kwargs, metadata, index=None,
                           optimizer_state=jax.tree.map(np.asarray,
                                                        opt_state))
        logs.main.write('\n* Training complete.\n')


def _seqlen_sync(reducer, tag):
    """Cross-host max of the sampled sequence length, via the repo's own
    TCP max-reduce channel (taiyaki_tpu/utils/hostsync.py).

    Deliberately NOT a device collective (multihost_utils.*): sampling
    runs on the prefetch thread, and interleaving its collectives with
    the main thread's train-step psums in different orders on different
    hosts deadlocks the ICI/DCN launch streams.  Plain host sockets are
    safe from any thread (and, unlike earlier revisions, public-API
    only — the JAX coordination-service KV store lives in jax._src).

    `tag` must be unique per reduction and issued in the same order on
    every host (iteration.sub_batch).  Reference equivalent:
    per-iteration true-max lattice sizing, ctc.pyx:126-134.
    """
    return lambda local_max: reducer.reduce(tag, local_max)


def _pad_batch(batch, target):
    """Repeat-pad a short batch to the static sub-batch size (keeps XLA
    shapes stable when the sampler comes up short).

    Padded rows get seqlens == 0, which the loss masks out of both the
    CRF cost and the logZ term AND excludes from the batch-mean divisor
    (train.make_loss_fn), so gradients equal training on the short batch
    — matching the reference, which simply trains on whatever passed
    (bin/train_flipflop.py:78-142).  Repeat-padding at full weight would
    silently over-weight the last chunk exactly when filters reject
    heavily."""
    from taiyaki_tpu.train import Batch
    n = batch.signal.shape[1]
    if n == 0:
        raise RuntimeError('No chunks passed filters — cannot build batch. '
                           'Check filter parameters.')
    reps = [min(i, n - 1) for i in range(target)]
    seqlens = batch.seqlens[reps].copy()
    seqlens[n:] = 0
    return Batch(
        batch.signal[:, reps, :], batch.seqs[reps], seqlens,
        None if batch.mod_cats is None else batch.mod_cats[reps])


if __name__ == '__main__':
    main(get_train_flipflop_parser().parse_args())
