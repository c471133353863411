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

    stride = net.stride
    try:
        transweights = _WORKER_STATE.forward(
            net, params, sig.standardized_current.astype(np.float32),
            stride)
    except Exception:
        return None, RemapResult.NETWORK_ERROR

    can_read_ref = alphabet_info.collapse_sequence(read_ref)
    _, path = flipflop_remap.flipflop_remap(
        transweights, can_read_ref, alphabet=alphabet_info.can_bases,
        localpen=localpen)

    int_ref = signal_mapping.SignalMapping.get_integer_reference(
        read_ref, alphabet_info.alphabet)
    sig_mapping = signal_mapping.SignalMapping.from_remapping_path(
        path, int_ref, stride, sig)
    try:
        return sig_mapping.get_read_dictionary(), RemapResult.SUCCESS
    except signal_mapping.TaiyakiSigMapError as e:
        return None, str(e)


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
