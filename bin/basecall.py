#!/usr/bin/env python3
"""Basecall reads with a trained flip-flop model
(reference: bin/basecall.py).

TPU-native design: one process drives the accelerator; chunks are padded
to a fixed [chunk_size, batch] shape so the network + Viterbi decode
compile once, chunks from consecutive reads are pooled into shared
device batches (small reads no longer pad a whole batch out alone), and
host code does only stitching and string assembly.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu.utils.cmdargs import (  # noqa: E402
    AutoBool, FileExists, NonNegative, ParseToNamedTuple, Positive)
from taiyaki_tpu.utils.common_cmdargs import add_common_command_args  # noqa


def get_parser():
    from taiyaki_tpu import basecall_helpers

    parser = argparse.ArgumentParser(
        description="Basecall reads using a taiyaki_tpu model",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_common_command_args(
        parser, """alphabet device input_folder input_strand_list jobs
        limit output quiet recursive version""".split())
    def _boolish(s):
        # bool('False') is True; accept the strings a user will type
        # (the reference's type=(int, bool) makes guided un-disableable)
        if str(s).lower() in ("false", "0", "no", "off"):
            return False
        if str(s).lower() in ("true", "1", "yes", "on"):
            return True
        raise argparse.ArgumentTypeError("expected a boolean, got %r" % s)

    parser.add_argument(
        "--beam", default=None, metavar=("width", "guided"), nargs=2,
        type=(int, _boolish), action=ParseToNamedTuple,
        help="Decode with the prefix beam search instead of Viterbi")
    parser.add_argument(
        "--chunk_size", type=Positive(int), metavar="blocks",
        default=basecall_helpers.DEFAULT_CHUNK_SIZE,
        help="Size of signal chunks sent to device is chunk_size * model "
             "stride")
    parser.add_argument(
        "--fastq", default=False, action=AutoBool,
        help="Emit fastq with per-base q scores rather than fasta")
    parser.add_argument(
        "--max_concurrent_chunks", type=Positive(int), default=128,
        help="Maximum number of chunks to call at once")
    parser.add_argument(
        "--ndevices", type=Positive(int), default=None,
        help="Shard chunk batches over this many local devices "
             "(default: all; replaces the reference's one-GPU-per-worker "
             "pool with SPMD over the chips)")
    parser.add_argument(
        "--overlap", type=NonNegative(int), metavar="blocks",
        default=basecall_helpers.DEFAULT_OVERLAP,
        help="Overlap between signal chunks sent to device")
    parser.add_argument(
        "--posterior", default=True, action=AutoBool,
        help="Decode by Viterbi over posteriors rather than transition scores")
    parser.add_argument(
        "--qscore_offset", type=float, default=0.0,
        help="Additive q-score adjustment, applied after scaling (fastq)")
    parser.add_argument(
        "--qscore_scale", type=float, default=1.0,
        help="Multiplicative q-score calibration factor (fastq)")
    parser.add_argument(
        "--reverse", default=False, action=AutoBool,
        help="Emit called sequences reversed (RNA 3p->5p order)")
    parser.add_argument(
        "--scaling", action=FileExists, default=None,
        help="TSV of per-read current scaling parameters")
    parser.add_argument(
        "--temperature", default=1.0, type=float,
        help="Multiply network outputs by this factor before decoding")
    parser.add_argument(
        "--modified_base_output", default=None,
        help="HDF5 file for modified-base scores (cat_mod models only); "
             "implements the documented format the reference never did")
    parser.add_argument(
        "model", action=FileExists,
        help="Checkpoint holding the trained network to call with")
    return parser


def med_mad_norm(x, dtype="f4"):
    from taiyaki_tpu.maths import med_mad
    med, mad = med_mad(x)
    return ((x - med) / mad).astype(dtype)


def get_signal(read_filename, read_id):
    from taiyaki_tpu.data import fast5utils
    from taiyaki_tpu.data.signal import Signal
    try:
        with fast5utils.get_fast5_file(read_filename) as f5:
            return Signal(f5.get_read(read_id)).current
    except Exception as e:
        sys.stderr.write(
            "Unable to obtain signal for {} from {}.\n{}\n".format(
                read_id, read_filename, repr(e)))
        return None


class Basecaller:
    """Jit-once basecalling engine: forward + (posterior) + Viterbi for a
    fixed [chunk_size, batch] shape.

    The full transition tensor is only fetched to the host when something
    downstream consumes it (q-scores, beam search): for plain Viterbi
    fasta calls only the [nblk+1, nchunk] paths cross the device-host
    link, ~40x less traffic per batch.

    With a multi-device `mesh`, the chunk batch axis is sharded over its
    ('data',) axis — every chunk is independent, so XLA partitions the
    whole forward+decode with no collectives.  This replaces the
    reference's one-model-per-GPU worker pool (bin/basecall.py:118-141)
    with SPMD over the local chips; results are identical to
    single-device calling."""

    def __init__(self, net, params, n_can_state, posterior, temperature,
                 max_batch, want_mods=False, want_trans=True,
                 want_errprobs=False, mesh=None):
        import jax
        import jax.numpy as jnp
        from taiyaki_tpu import flipflopfings, qscores
        from taiyaki_tpu.constants import SMALL_VAL
        from taiyaki_tpu.ops import decode as dec

        self.max_batch = max_batch
        self.want_mods = want_mods
        self.want_trans = want_trans
        self.want_errprobs = want_errprobs

        nbases = flipflopfings.nbase_flipflop(n_can_state)
        base_mask = np.zeros((n_can_state, nbases), dtype=np.float32)
        for b in range(nbases):
            base_mask[qscores.transitions_into_base(b, nbases), b] = 1.0

        def errprobs_on_device(trans, paths):
            # Same computation as qscores.errprobs_from_trans (which
            # mirrors the reference exactly, including that the input is
            # log posteriors): p = weight into called base / weight into
            # any base; row 0 = -1.
            baseprobs = trans @ jnp.asarray(base_mask)
            baseprobs = baseprobs / (
                jnp.sum(baseprobs, axis=2, keepdims=True) + SMALL_VAL)
            dest = paths[1:] % nbases
            p = jnp.take_along_axis(baseprobs, dest[..., None],
                                    axis=2)[..., 0]
            return jnp.concatenate(
                [jnp.full((1, paths.shape[1]), -1.0, jnp.float32),
                 1.0 - p], axis=0)

        def call_chunks(params, chunks):
            # Return a dict holding ONLY what this mode consumes: on
            # remote-execution runtimes every fetched output array costs
            # a fixed per-array RPC (~tens of ms) regardless of size —
            # even zero-sized placeholders — so fasta mode returns just
            # the Viterbi paths (1 fetch/batch, was 4).  gather()
            # synthesizes the absent pieces as host-side empties.
            out = net.apply(params, chunks)
            trans = out[:, :, :n_can_state] * temperature
            res = {}
            if want_mods:
                res["mods"] = out[:, :, n_can_state:]
            if posterior:
                trans = jnp.log(dec.flipflop_make_trans(trans) + 1e-8)
            _, _, paths = dec.flipflop_viterbi(trans)
            res["paths"] = paths
            if want_errprobs:
                res["errprobs"] = errprobs_on_device(trans, paths)
            if want_trans:
                res["trans"] = trans
            return res

        # params uploaded once; passing host numpy would re-transfer the
        # whole pytree on every call
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            from taiyaki_tpu.parallel.mesh import round_batch_to_mesh
            # submitted parts are padded to max_batch, which must divide
            # evenly across the data axis; round DOWN so the user's
            # --max_concurrent_chunks stays an honest memory cap
            self.max_batch = round_batch_to_mesh(max_batch, mesh)
            rep = NamedSharding(mesh, P())
            vec = NamedSharding(mesh, P(None, "data"))
            mat = NamedSharding(mesh, P(None, "data", None))
            self.params = jax.device_put(params, rep)
            out_sh = {"paths": vec}
            if want_mods:
                out_sh["mods"] = mat
            if want_errprobs:
                out_sh["errprobs"] = vec
            if want_trans:
                out_sh["trans"] = mat
            self._fn = jax.jit(call_chunks,
                               in_shardings=(rep, mat),
                               out_shardings=out_sh)
        else:
            self.params = jax.device_put(params)
            self._fn = jax.jit(call_chunks)

    def submit(self, chunks):
        """Dispatch chunks [T, nchunk, 1] to the device WITHOUT waiting:
        returns a list of (valid_cols, device_results) per max_batch part.
        JAX dispatch is asynchronous, so the device starts working while
        the host goes on to finalize earlier batches (flush pipelining).
        """
        n = chunks.shape[1]
        handles = []
        for i in range(0, n, self.max_batch):
            part = chunks[:, i:i + self.max_batch]
            k = part.shape[1]
            if k < self.max_batch:
                pad = np.repeat(part[:, -1:], self.max_batch - k, axis=1)
                part = np.concatenate([part, pad], axis=1)
            handles.append((k, self._fn(self.params, part)))
        return handles

    @staticmethod
    def gather(handles):
        """Fetch submitted results -> (trans [nblk, nchunk, S] (or 0 cols
        when not wanted), paths [nblk+1, nchunk],
        mods [nblk, nchunk, nmodcol], errprobs [nblk+1, nchunk] (or 0
        rows)).  Pieces the device program didn't compute (see
        call_chunks) are synthesized as host-side empty arrays — never
        fetched, so a fasta call costs ONE device->host transfer."""
        out_trans, out_paths, out_mods, out_errp = [], [], [], []
        for k, res in handles:
            paths = np.asarray(res["paths"][:, :k])
            nblk = paths.shape[0] - 1
            out_paths.append(paths)
            out_trans.append(np.asarray(res["trans"][:, :k])
                             if "trans" in res
                             else np.zeros((nblk, k, 0), np.float32))
            out_mods.append(np.asarray(res["mods"][:, :k])
                            if "mods" in res
                            else np.zeros((nblk, k, 0), np.float32))
            out_errp.append(np.asarray(res["errprobs"][:, :k])
                            if "errprobs" in res
                            else np.zeros((0, k), np.float32))
        return (np.concatenate(out_trans, axis=1),
                np.concatenate(out_paths, axis=1),
                np.concatenate(out_mods, axis=1),
                np.concatenate(out_errp, axis=1))

    def __call__(self, chunks):
        return self.gather(self.submit(chunks))


def prepare_read(read_id, signal, chunk_size, overlap, read_params,
                 reverse_model):
    """Host-side read staging: normalize + chunk + pad to static shapes.

    Returns a dict carrying the [chunk_size, nchunk, 1] chunks and the
    stitch metadata needed by finalize_read, or None if there is no
    signal.  Chunks from many reads are concatenated on the batch axis
    and sent to the device together (cross-read batching) — the
    reference instead runs one model call per read
    (bin/basecall.py:151-242), which underfills wide batches.
    """
    from taiyaki_tpu import basecall_helpers

    if signal is None:
        return None
    if reverse_model:
        signal = signal[::-1]
    if read_params is None:
        normed = med_mad_norm(signal)
    else:
        normed = ((signal - read_params["shift"])
                  / read_params["scale"]).astype("f4")

    chunks, chunk_starts, chunk_ends = basecall_helpers.chunk_read(
        normed, chunk_size, overlap)
    # Pad a short (single-chunk) read up to the static chunk size.
    true_len = chunks.shape[0]
    if true_len < chunk_size:
        pad = np.zeros((chunk_size - true_len, 1, 1), dtype=np.float32)
        chunks = np.concatenate([chunks, pad], axis=0)
    return dict(read_id=read_id, chunks=chunks, chunk_starts=chunk_starts,
                chunk_ends=chunk_ends, true_len=true_len,
                nsample=len(signal))


def finalize_read(prep, trans, paths, mods, errprobs, chunk_size, stride,
                  alphabet, fastq, qscore_scale, qscore_offset, beam=None,
                  want_mods=False, can_nmods=None):
    """Host-side post-processing of one read's slice of the device
    output: stitch, (beam) decode, q-string and mod-score assembly."""
    from taiyaki_tpu import basecall_helpers, qscores
    from taiyaki_tpu.flipflopfings import path_to_str

    chunk_starts = prep["chunk_starts"]
    chunk_ends = prep["chunk_ends"]
    true_len = prep["true_len"]
    if true_len < chunk_size:
        nblk = -(-true_len // stride)
        trans = trans[:nblk]
        paths = paths[:nblk + 1]
        mods = mods[:nblk]
        errprobs = errprobs[:nblk + 1]

    if beam is not None:
        from taiyaki_tpu import decodeutil
        stitched_trans = basecall_helpers.stitch_chunks(
            trans, chunk_starts, chunk_ends, stride)
        best_path, _ = decodeutil.beamsearch(
            stitched_trans, beam_width=beam.width, guided=beam.guided)
    else:
        best_path = basecall_helpers.stitch_chunks(
            paths, chunk_starts, chunk_ends, stride)

    qstring = None
    if fastq and beam is not None:
        # q-scores along the beam path: the beam returns a base sequence
        # with no block alignment, so align it back to the blocks with
        # the glocal remap Viterbi against the same stitched scores the
        # beam consumed, then read per-base error probabilities off that
        # alignment exactly as the Viterbi path does.  (The reference's
        # own beam+fastq branch is a latent NameError,
        # /root/reference/bin/basecall.py:215-229 — this exceeds it
        # instead of degrading to fasta.)
        from taiyaki_tpu import flipflop_remap
        from taiyaki_tpu.flipflopfings import nbase_flipflop
        nbase = nbase_flipflop(stitched_trans.shape[1])
        seq_str = path_to_str(best_path, alphabet=alphabet[:nbase],
                              include_first_source=True)
        _, pos_path = flipflop_remap.flipflop_remap(
            np.asarray(stitched_trans), seq_str,
            alphabet=alphabet[:nbase])
        pos_path = np.clip(pos_path, 0, len(best_path) - 1)
        state_path = np.asarray(best_path)[pos_path]
        block_errprobs = qscores.errprobs_from_trans(
            np.asarray(stitched_trans)[:, None, :],
            state_path[:, None])[:, 0]
        qstring = qscores.path_errprobs_to_qstring(
            block_errprobs, state_path, qscore_scale, qscore_offset)
    elif fastq:
        # per-chunk error probs were computed on-device alongside Viterbi
        stitched_errprobs = basecall_helpers.stitch_chunks(
            errprobs, chunk_starts, chunk_ends, stride)
        qstring = qscores.path_errprobs_to_qstring(
            stitched_errprobs, best_path, qscore_scale, qscore_offset)

    basecall = path_to_str(best_path, alphabet=alphabet,
                           include_first_source=False)

    mod_scores = None
    if want_mods and beam is None:
        from taiyaki_tpu.flipflopfings import path_mod_scores
        stitched_mods = basecall_helpers.stitch_chunks(
            mods, chunk_starts, chunk_ends, stride)
        # The transition path[t]->path[t+1] and the mod stream row for it
        # both come from output block t (path_mod_scores docstring).
        n = min(len(best_path), len(stitched_mods) + 1)
        mod_scores = path_mod_scores(
            best_path[:n], stitched_mods, can_nmods)
    return basecall, qstring, mod_scores


def main():
    args = get_parser().parse_args()
    # Inference keeps f32 input-gate streams: the bf16 default is a
    # training-throughput trade (taiyaki_tpu/ops/rnn.py) and basecalls
    # should not pay accuracy for it.  Exported env wins if set.
    os.environ.setdefault("TAIYAKI_TPU_F32_GATES", "1")
    os.environ.setdefault("TAIYAKI_TPU_F32_SCORES", "1")
    import jax
    # True f32 for every matmul/conv: TPU's DEFAULT precision runs f32
    # dots as one bf16 pass; 'highest' restores multi-pass f32 so TPU
    # basecalls track the CPU reference as closely as the MXU allows
    # (the Pallas kernels honor the same switch via TAIYAKI_TPU_F32_GATES)
    jax.config.update("jax_default_matmul_precision", "highest")
    from taiyaki_tpu.utils.helpers import select_jax_platform
    select_jax_platform(args.device)

    from taiyaki_tpu.data import fast5utils
    from taiyaki_tpu.flipflopfings import nstate_flipflop
    from taiyaki_tpu.prepare_mapping_funcs import (
        get_per_read_params_dict_from_tsv)
    from taiyaki_tpu.utils import helpers
    from taiyaki_tpu.utils.helpers import Progress, open_file_or_stdout

    sys.stderr.write("* Initializing reads file search.\n")
    fast5_reads = fast5utils.iterate_fast5_reads(
        args.input_folder, limit=args.limit,
        strand_list=args.input_strand_list, recursive=args.recursive)

    if args.scaling is not None:
        sys.stderr.write("* Loading read scaling parameters from {}.\n"
                         .format(args.scaling))
        all_read_params = get_per_read_params_dict_from_tsv(args.scaling)
        fast5_reads = [rec for rec in fast5_reads
                       if rec[1] in all_read_params]
    else:
        all_read_params = {}

    net, params, _, metadata, _, _ = helpers.load_model(args.model)
    if params is None:
        sys.exit("* Error: pass a .checkpoint (a model description .py has "
                 "no trained weights)")
    stride = net.stride
    chunk_size = args.chunk_size * stride
    overlap = args.overlap * stride
    n_can_state = nstate_flipflop(len(args.alphabet))

    from taiyaki_tpu import layers
    can_nmods = None
    mod_writer = None
    if args.modified_base_output is not None:
        if args.beam is not None:
            # the beam path returns a base sequence with no block
            # alignment, so per-base mod scores cannot be extracted —
            # fail loudly rather than write an empty mod file
            sys.exit("* Error: --modified_base_output requires the "
                     "Viterbi decoder (drop --beam)")
        import h5py
        if not layers.is_cat_mod_model(net):
            sys.exit("* Error: --modified_base_output requires a cat_mod "
                     "model")
        head = net.sublayers[-1]
        can_nmods = head.can_nmods
        mod_writer = h5py.File(args.modified_base_output, "w")
        mod_writer.create_dataset(
            "mod_long_names",
            data=np.array(head.ordered_mod_long_names,
                          dtype=h5py.special_dtype(vlen=str)))
        mod_writer.create_group("Reads")
    if args.ndevices is None and isinstance(args.device, int):
        # an explicit --device INDEX pins work to that chip; defaulting
        # the mesh to all local chips would silently override the pin
        ndev = 1
    else:
        ndev = args.ndevices or jax.local_device_count()
    if ndev > jax.local_device_count():
        sys.exit("* Error: --ndevices {} requested but only {} local "
                 "devices are available".format(ndev,
                                                jax.local_device_count()))
    mesh = None
    if ndev > 1:
        from taiyaki_tpu.parallel.mesh import data_mesh
        mesh = data_mesh(jax.local_devices()[:ndev])
        sys.stderr.write(
            "* Sharding chunk batches over {} devices.\n".format(ndev))
    caller = Basecaller(net, params, n_can_state, args.posterior,
                        args.temperature, args.max_concurrent_chunks,
                        want_mods=can_nmods is not None,
                        want_trans=args.beam is not None,
                        want_errprobs=args.fastq and args.beam is None,
                        mesh=mesh)

    sys.stderr.write("* Calling reads.\n")
    nbase = ncalled = nread = nsample = 0
    t0 = time.time()
    progress = Progress(quiet=args.quiet)
    startcharacter = "@" if args.fastq else ">"

    # Prefetch raw signals with a thread pool (--jobs) so fast5 IO overlaps
    # device compute; replaces the reference's per-worker model pool — on
    # TPU one process drives the accelerator and only IO parallelizes.
    from concurrent.futures import ThreadPoolExecutor
    # keep fast5_reads lazy: list() would force the full directory scan
    # (one open per fast5) before the first basecall
    reads = fast5_reads

    def fetch(item):
        return item[0], item[1], get_signal(item[0], item[1])

    pool = ThreadPoolExecutor(max_workers=max(1, args.jobs))

    def bounded_prefetch(items, depth):
        """Ordered results with at most `depth` fetches in flight.

        Executor.map would submit EVERY read's fetch up front: all raw
        signals end up resident at once (tens of GB on large runs) and
        later-submitted finalize tasks queue behind the whole fetch
        backlog, serializing the read pipeline.  Bounding the window
        keeps memory flat and lets finalize work interleave (same
        pattern as prepare_mapping_funcs.batched_remap_results)."""
        from collections import deque
        q = deque()
        for item in items:
            q.append(pool.submit(fetch, item))
            if len(q) >= depth:
                yield q.popleft().result()
        while q:
            yield q.popleft().result()

    fetched = bounded_prefetch(reads, depth=max(4, 2 * args.jobs))
    reverse_model = metadata.get("reverse", False)

    with open_file_or_stdout(args.output) as fh:
        # Cross-read batching: pool chunks from consecutive reads and call
        # the device once the pool holds a full batch, so small reads share
        # device batches instead of each padding one out alone.
        pending = []
        pend_chunks = 0
        # One batch in flight: flush() dispatches the current pool to the
        # device (async) and then finalizes the PREVIOUS batch on the host
        # (Viterbi stitch / beam search / fastq writing), so host post-
        # processing of batch i-1 overlaps device compute of batch i.
        inflight = None

        def finalize_batch(batch_reads, handles):
            nonlocal nbase, ncalled, nsample
            trans, paths, mods, errprobs = caller.gather(handles)

            def finalize_one(p, off):
                k = p["chunks"].shape[1]
                return finalize_read(
                    p, trans[:, off:off + k], paths[:, off:off + k],
                    mods[:, off:off + k], errprobs[:, off:off + k],
                    chunk_size, stride,
                    args.alphabet, args.fastq, args.qscore_scale,
                    args.qscore_offset, args.beam,
                    want_mods=caller.want_mods, can_nmods=can_nmods)

            # Per-read post-processing in threads: the beam search is a
            # GIL-releasing C call and the stitching is numpy, so reads
            # decode in parallel; writes stay in order below.
            offs, off = [], 0
            for p in batch_reads:
                offs.append(off)
                off += p["chunks"].shape[1]
            results = list(pool.map(finalize_one, batch_reads, offs))
            for p, (basecall, qstring, mod_scores) in zip(batch_reads,
                                                          results):
                if mod_writer is not None and mod_scores is not None:
                    if p["read_id"] in mod_writer["Reads"]:
                        # same read present in two input files: keep the
                        # first call instead of crashing on the h5 name
                        sys.stderr.write(
                            "* Warning: duplicate read id {}; keeping "
                            "the first mod-score table.\n"
                            .format(p["read_id"]))
                    else:
                        mod_writer["Reads"].create_dataset(
                            p["read_id"],
                            data=mod_scores.astype(np.float32))
                if basecall is not None and len(basecall) > 0:
                    fh.write("{}{}\n{}\n".format(
                        startcharacter, p["read_id"],
                        basecall[::-1] if args.reverse else basecall))
                    nbase += len(basecall)
                    ncalled += 1
                    if args.fastq and qstring is not None:
                        fh.write("+\n{}\n".format(
                            qstring[::-1] if args.reverse else qstring))
                nsample += p["nsample"]
                progress.step()

        def flush():
            nonlocal inflight, pend_chunks
            batch = None
            if pending:
                all_chunks = np.concatenate(
                    [p["chunks"] for p in pending], axis=1)
                batch = (list(pending), caller.submit(all_chunks))
                pending.clear()
                pend_chunks = 0
            if inflight is not None:
                finalize_batch(*inflight)
            inflight = batch

        for read_filename, read_id, signal in fetched:
            nread += 1
            prep = prepare_read(read_id, signal, chunk_size, overlap,
                                all_read_params.get(read_id), reverse_model)
            if prep is None:
                progress.step()
                continue
            pending.append(prep)
            pend_chunks += prep["chunks"].shape[1]
            if pend_chunks >= args.max_concurrent_chunks:
                flush()
        flush()   # dispatch the tail pool, finalize the previous batch
        flush()   # finalize the tail batch
    total_time = time.time() - t0
    sys.stderr.write("* Called {} reads in {:.2f}s\n".format(
        nread, total_time))
    sys.stderr.write("* {:7.2f} kbase / s\n".format(
        nbase / total_time / 1000.0))
    sys.stderr.write("* {:7.2f} ksample / s\n".format(
        nsample / total_time / 1000.0))
    sys.stderr.write("* {} reads failed.\n".format(nread - ncalled))
    if mod_writer is not None:
        mod_writer.close()


if __name__ == "__main__":
    main()
