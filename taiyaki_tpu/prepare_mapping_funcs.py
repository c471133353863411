"""Remapping orchestration (reference: taiyaki/prepare_mapping_funcs.py).

oneread_remap is the per-read worker: fast5 signal -> network forward ->
glocal Viterbi against the collapsed reference -> SignalMapping dict.

TPU/XLA note: read lengths vary, so the worker pads every signal up to a
multiple of LEN_BUCKET samples before the jitted forward and trims the
output blocks — without this every read length would trigger a fresh XLA
compile (the reference's torch runs eagerly and has no such concern).
"""

import enum
import sys
from collections import defaultdict

import numpy as np

from taiyaki_tpu import flipflop_remap
from taiyaki_tpu.data import signal as signal_mod
from taiyaki_tpu.data import signal_mapping
from taiyaki_tpu.data.fast5utils import get_fast5_file
from taiyaki_tpu.data.mapped_signal_files import MappedSignalWriter
from taiyaki_tpu.utils import helpers
from taiyaki_tpu.utils.fileio import readtsv

# Signal length quantum for the remapping forward pass.
LEN_BUCKET = 2048


class RemapResult(enum.Enum):
    """Outcomes of remapping one read."""
    SUCCESS = "Success!"
    READ_ID_INFO_NOT_FOUND = "No information for read id found in file."
    NO_REF_FOUND = "No fasta reference found."
    NO_PARAMS = "No per-read params provided."
    NETWORK_ERROR = "Failure applying basecall network to remap read."
    REF_TOO_LONG = "Reference exceeded maximum allowed read length."


class RemapWorkerState:
    """Per-process lazily-initialized network + jit cache."""

    def __init__(self):
        self.apply_fn = None

    def forward(self, net, params, standardized_current, stride):
        """Network forward on a padded copy of the signal; returns the
        transition weights for the true number of blocks."""
        import jax
        import jax.numpy as jnp
        if self.apply_fn is None:
            self.apply_fn = jax.jit(net.apply)
        siglen = len(standardized_current)
        padded_len = -(-siglen // LEN_BUCKET) * LEN_BUCKET
        padded = np.zeros((padded_len, 1, 1), dtype=np.float32)
        padded[:siglen, 0, 0] = standardized_current
        out = np.asarray(self.apply_fn(params, jnp.asarray(padded)))
        nblk = -(-siglen // stride)
        return out[:nblk, 0]


_WORKER_STATE = RemapWorkerState()


def stage_read(read_tuple, per_read_params_dict, max_read_length):
    """Host IO half of remapping: validate + load + standardize signal.

    Returns:
        (staged dict, None) on success, else (None, RemapResult).
    """
    filename, read_id, read_ref = read_tuple
    if read_ref is None:
        return None, RemapResult.NO_REF_FOUND
    if max_read_length is not None and len(read_ref) > max_read_length:
        return None, RemapResult.REF_TOO_LONG
    try:
        read_params = per_read_params_dict[read_id]
    except KeyError:
        return None, RemapResult.NO_PARAMS

    try:
        with get_fast5_file(filename) as f5:
            read = f5.get_read(read_id)
            sig = signal_mod.Signal(read, read_params=read_params)
    except Exception:
        return None, RemapResult.READ_ID_INFO_NOT_FOUND
    return {
        "sig": sig,
        "current": sig.standardized_current.astype(np.float32),
        "read_ref": read_ref,
    }, None


def finish_remap(staged, transweights, alphabet_info, stride, localpen):
    """Post-forward half: glocal Viterbi vs the collapsed reference ->
    SignalMapping read dict."""
    read_ref = staged["read_ref"]
    can_read_ref = alphabet_info.collapse_sequence(read_ref)
    _, path = flipflop_remap.flipflop_remap(
        transweights, can_read_ref, alphabet=alphabet_info.can_bases,
        localpen=localpen)

    int_ref = signal_mapping.SignalMapping.get_integer_reference(
        read_ref, alphabet_info.alphabet)
    sig_mapping = signal_mapping.SignalMapping.from_remapping_path(
        path, int_ref, stride, staged["sig"])
    try:
        return sig_mapping.get_read_dictionary(), RemapResult.SUCCESS
    except signal_mapping.TaiyakiSigMapError as e:
        return None, str(e)


def oneread_remap(read_tuple, net, params, per_read_params_dict,
                  alphabet_info, max_read_length, localpen=0.0):
    """Remap one read (worker function for imap_mp).

    Args:
        read_tuple: (filename, read_id, read reference string or None).
        net/params: remapping network and its parameters.
        per_read_params_dict: read_id -> {trim_start, trim_end, shift,
            scale}.
        alphabet_info: full (possibly modified-base) alphabet.
        max_read_length: skip reads with references longer than this.
        localpen: local-alignment penalty (0.0 = local).

    Returns:
        (read dict or None, RemapResult or error string)
    """
    staged, err = stage_read(read_tuple, per_read_params_dict,
                             max_read_length)
    if staged is None:
        return None, err

    stride = net.stride
    try:
        transweights = _WORKER_STATE.forward(
            net, params, staged["current"], stride)
    except Exception:
        return None, RemapResult.NETWORK_ERROR
    return finish_remap(staged, transweights, alphabet_info, stride,
                        localpen)


def batched_remap_results(read_tuples, net, params, per_read_params_dict,
                          alphabet_info, max_read_length, localpen=0.0,
                          batch_size=8, io_threads=4, device=None):
    """Remap reads with BATCHED on-device forwards (accelerator path).

    The reference remaps one read per GPU worker (taiyaki/
    prepare_mapping_funcs.py, `device` arg); on TPU one process drives
    the chip, so instead reads are staged by an IO thread pool, grouped
    into per-length-bucket pools (signals padded to LEN_BUCKET multiples
    keep shapes static -> one XLA compile per bucket), forwarded
    `batch_size` at a time, and finished (host Viterbi remap) in stream
    order.  Yields (read dict or None, RemapResult or error string) like
    imap_mp(oneread_remap, ...).

    Mappings agree with the per-read path except at near-tie Viterbi
    boundaries (<1% of positions), which can shift by several blocks
    where the scores plateau (signal stalls): XLA tiles (and therefore
    rounds) a [L, 8, 1] forward differently from [L, 1, 1], on any
    backend.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    if device is not None:
        # committed params pin the computation to the requested device
        # (DeviceAction integer index, e.g. --device 1)
        params = jax.device_put(params, device)
    apply_fn = jax.jit(net.apply)
    stride = net.stride

    def flush(padded_len, items):
        """Forward one length-bucket pool; yields per-read results."""
        batch = np.zeros((padded_len, batch_size, 1), dtype=np.float32)
        for j, st in enumerate(items):
            batch[:len(st["current"]), j, 0] = st["current"]
        try:
            out = np.asarray(apply_fn(params, jnp.asarray(batch)))
        except Exception:
            for st in items:
                yield None, RemapResult.NETWORK_ERROR
            return
        for j, st in enumerate(items):
            nblk = -(-len(st["current"]) // stride)
            yield finish_remap(st, out[:nblk, j], alphabet_info, stride,
                               localpen)

    # Bounded staging window: Executor.map would submit the WHOLE read
    # iterator up front and stage every signal in memory; instead keep
    # only a small queue of futures in flight so memory stays constant
    # on arbitrarily large runs (the per-read path's imap_mp has the
    # same property via its chunked Pool feeding).
    pool = ThreadPoolExecutor(max_workers=max(1, io_threads))
    window = max(2 * batch_size, 4 * max(1, io_threads))
    pending = deque()
    read_iter = iter(read_tuples)

    def top_up():
        while len(pending) < window:
            try:
                rt = next(read_iter)
            except StopIteration:
                return
            pending.append(pool.submit(
                stage_read, rt, per_read_params_dict, max_read_length))

    pools = defaultdict(list)
    try:
        top_up()
        while pending:
            staged, err = pending.popleft().result()
            top_up()
            if staged is None:
                yield None, err
                continue
            padded_len = -(-len(staged["current"]) // LEN_BUCKET
                           ) * LEN_BUCKET
            pools[padded_len].append(staged)
            if len(pools[padded_len]) == batch_size:
                yield from flush(padded_len, pools.pop(padded_len))
        for padded_len, items in sorted(pools.items()):
            yield from flush(padded_len, items)
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def generate_output_from_results(results, output, alphabet_info,
                                 verbose=True, batch_format=True):
    """Stream worker results into a mapped-signal file, tallying errors."""
    progress = helpers.Progress(quiet=not verbose)
    err_types = defaultdict(int)
    with MappedSignalWriter(output, alphabet_info, batch_format) as msw:
        for resultdict, mesg in results:
            if resultdict is None:
                err_types[mesg] += 1
            else:
                progress.step()
                msw.write_read(resultdict)
    sys.stderr.write("\n")
    sys.stderr.write("* {} reads mapped successfully\n".format(
        progress.count))
    for result, n_errs in err_types.items():
        desc = result.value if isinstance(result, RemapResult) else result
        sys.stderr.write("* {} reads failed to produce remapping results "
                         "due to: {}\n".format(n_errs, desc))


def get_per_read_params_dict_from_tsv(input_file):
    """Load the per-read params TSV (UUID, trim_start, trim_end, shift,
    scale) into a dict keyed by UUID."""
    try:
        table = readtsv(input_file, ["UUID", "trim_start", "trim_end",
                                     "shift", "scale"])
    except Exception as e:
        sys.stderr.write("Failed to get per-read parameters from {}.\n{}\n"
                         .format(input_file, repr(e)))
        return None
    out = {}
    for row in table:
        try:
            out[str(row["UUID"])] = {
                "trim_start": int(row["trim_start"]),
                "trim_end": int(row["trim_end"]),
                "shift": float(row["shift"]),
                "scale": float(row["scale"])}
        except Exception:
            sys.stderr.write("Warning: ignoring incorrect line {} in {}\n"
                             .format(tuple(row), input_file))
    return out
