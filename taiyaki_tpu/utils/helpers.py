"""Orchestration helpers: model load/save, logging, progress, provenance.

Reference behavior: taiyaki/helpers.py.  Checkpoint design differs from the
reference (which pickles whole torch modules): a checkpoint here is a
pickled dict holding
    {"model_source": <text of the model description .py file>,
     "model_kwargs": <factory kwargs>,
     "params": <numpy pytree>,
     "optimizer_state": <optax state or None>,   # improvement: the
                                                 # reference does not
                                                 # checkpoint optimizer state
     "metadata": {"reverse": ..., "standardize": ..., "version": 3}}
so that loading needs no access to the original model file, and resume
restores optimizer state exactly.
"""

import hashlib
import os
import pickle
import platform
import sys
import time
import types
import warnings

import numpy as np

from taiyaki_tpu import MODEL_VERSION, __version__
from taiyaki_tpu.alphabet import AlphabetInfo


# -- model description loading ----------------------------------------------

def _exec_model_source(source, name="netmodule"):
    """Build a module object from model-description source text."""
    module = types.ModuleType(name)
    exec(compile(source, name, "exec"), module.__dict__)
    return module


def _alphabet_to_spec(alphabet_info):
    if alphabet_info is None:
        return None
    return {"alphabet": alphabet_info.alphabet,
            "collapse_alphabet": alphabet_info.collapse_alphabet,
            "mod_long_names": alphabet_info.mod_long_names}


def _spec_to_alphabet(spec):
    if spec is None:
        return None
    return AlphabetInfo(spec["alphabet"], spec["collapse_alphabet"],
                        spec["mod_long_names"])


def new_model(model_file, model_metadata=None, **model_kwargs):
    """Build a fresh network from a model-description .py file.

    Returns:
        (network, model_source, metadata) — call
        params = network.init(numpy_rng) to initialise.
    """
    with open(model_file) as fh:
        source = fh.read()
    module = _exec_model_source(source)
    network = module.network(**model_kwargs)
    metadata = dict(model_metadata or {})
    metadata["version"] = MODEL_VERSION
    return network, source, metadata


def save_model(outdir, network, params, model_source, model_kwargs,
               metadata, index=None, optimizer_state=None):
    """Write model_checkpoint_XXXXX.checkpoint (+ .params with the raw
    parameter arrays) under outdir; index None means 'final'
    (reference: helpers.py:32-79)."""
    basename = ("model_final" if index is None
                else "model_checkpoint_{:05d}".format(index))
    params_np = _tree_to_numpy(params)
    ckpt = {
        "model_source": model_source,
        "model_kwargs": dict(model_kwargs,
                             alphabet_info=_alphabet_to_spec(
                                 model_kwargs.get("alphabet_info"))),
        "params": params_np,
        "optimizer_state": optimizer_state,
        "metadata": dict(metadata),
    }
    model_file = os.path.join(outdir, basename + ".checkpoint")
    with open(model_file, "wb") as fh:
        pickle.dump(ckpt, fh)
    with open(os.path.join(outdir, basename + ".params"), "wb") as fh:
        pickle.dump(params_np, fh)
    return model_file


def load_model(model_file, params_file=None, model_metadata=None,
               **model_kwargs):
    """Load a model from a .py description (fresh init required by caller)
    or a .checkpoint file (params restored).

    Returns:
        (network, params_or_None, model_source, metadata, model_kwargs,
         optimizer_state_or_None)
    """
    _, extension = os.path.splitext(model_file)
    if extension == ".py":
        network, source, metadata = new_model(
            model_file, model_metadata, **model_kwargs)
        return network, None, source, metadata, model_kwargs, None

    with open(model_file, "rb") as fh:
        ckpt = pickle.load(fh)
    metadata = ckpt["metadata"]
    assert metadata.get("version") == MODEL_VERSION, (
        "Attempted to load a checkpoint with model version {} "
        "(expected {})".format(metadata.get("version"), MODEL_VERSION))
    if model_metadata is not None:
        for key in ("reverse", "standardize"):
            if key in model_metadata and metadata.get(key) != \
                    model_metadata[key]:
                sys.stderr.write(
                    "* WARNING: Model and model_metadata {} are "
                    "inconsistent.\n".format(key))
                warnings.warn("Inconsistent metadata", RuntimeWarning)
                metadata[key] = model_metadata[key]
    kwargs = dict(ckpt["model_kwargs"])
    kwargs["alphabet_info"] = _spec_to_alphabet(kwargs.get("alphabet_info"))
    module = _exec_model_source(ckpt["model_source"])
    network = module.network(**kwargs)
    params = ckpt["params"]
    if params_file is not None:
        with open(params_file, "rb") as fh:
            params = pickle.load(fh)
    return (network, params, ckpt["model_source"], metadata, kwargs,
            ckpt.get("optimizer_state"))


def _tree_to_numpy(tree):
    """Device arrays -> host numpy throughout a pytree."""
    if isinstance(tree, dict):
        return {k: _tree_to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_tree_to_numpy(v) for v in tree)
    if hasattr(tree, "__array__"):
        return np.asarray(tree)
    return tree


def guess_model_stride(net, params=None):
    """Total time stride of a network (reference: helpers.py:150-162)."""
    from taiyaki_tpu import layers
    if params is None:
        params = net.init(np.random.default_rng(0))
    return layers.guess_model_stride(net, params)


# -- smoothing / logging -----------------------------------------------------

class WindowedExpSmoother:
    """Exponentially-weighted average over a fixed window
    (reference: helpers.py:212-257)."""

    def __init__(self, alpha=0.95, n_vals=100):
        assert 0.0 <= alpha <= 1.0
        self.alpha = alpha
        self.weights = np.power(alpha, np.arange(n_vals))
        self.vals = np.full(n_vals, np.nan)
        self.n_valid = 0

    @property
    def value(self):
        if self.n_valid == 0:
            return np.nan
        n = min(self.n_valid, len(self.vals))
        return np.average(self.vals[:n], weights=self.weights[:n])

    def update(self, val):
        self.vals[1:] = self.vals[:-1]
        self.vals[0] = val
        self.n_valid += 1


class Logger:
    """Tee log messages to an unbuffered file and stdout
    (reference: helpers.py:260-299)."""

    def __init__(self, log_file_name=None, quiet=False):
        self.fh = (None if log_file_name is None
                   else open(log_file_name, "wb", 0))
        self.quiet = quiet

    def write(self, message):
        if not self.quiet:
            sys.stdout.write(message)
            sys.stdout.flush()
        if self.fh is not None:
            try:
                self.fh.write(message.encode("utf-8"))
            except IOError as e:
                print("Failed to write to log\n Message: {}\n Error: {}"
                      .format(message, repr(e)))


COLOURS = [91, 93, 95, 92, 35, 33, 94]


class Progress:
    """Coloured dot-per-unit progress indicator
    (reference: helpers.py:323-383)."""

    def __init__(self, fh=sys.stderr, every=1, maxlen=50, quiet=False):
        assert every > 0
        self.count = 0
        self.every = every
        self._maxlen = maxlen
        self.fh = fh
        self.quiet = quiet

    def step(self):
        self.count += 1
        if self.quiet:
            return
        if self.count % self.every == 0:
            dotcount = self.count // self.every
            self.fh.write("\033[1;{}m.\033[m".format(
                COLOURS[dotcount % len(COLOURS)]))
            if dotcount % self._maxlen == 0:
                self.fh.write("{:8d}\n".format(self.count))
            self.fh.flush()

    @property
    def line_written(self):
        """True exactly when the dot just printed completed a row
        (reference: helpers.py:377-383)."""
        return (self.count > 0 and self.count % self.every == 0
                and (self.count // self.every) % self._maxlen == 0)


def file_md5(filename, nblock=1024):
    """MD5 hex digest of a file (reference: helpers.py:302-317)."""
    hasher = hashlib.md5()
    block_size = nblock * hasher.block_size
    with open(filename, "rb") as fh:
        for blk in iter(lambda: fh.read(block_size), b""):
            hasher.update(blk)
    return hasher.hexdigest()


class _StdoutGuard:
    """Context manager around sys.stdout that does NOT close it on exit
    (the reference's open_file_or_stdout guard, helpers.py:386-413) —
    callers use `with open_file_or_stdout(...)` and a bare sys.stdout
    would be closed by file.__exit__, breaking every later write."""

    def __enter__(self):
        return sys.stdout

    def __exit__(self, *exc):
        sys.stdout.flush()
        return False

    def write(self, data):
        return sys.stdout.write(data)

    def flush(self):
        return sys.stdout.flush()


def open_file_or_stdout(filename):
    """Open a file for writing, or a non-closing stdout wrapper for
    None/'-'."""
    if filename is None or filename == "-":
        return _StdoutGuard()
    return open(filename, "w")


def prepare_outdir(outdir, overwrite=False):
    """Create the output directory; refuse to clobber unless overwrite."""
    if os.path.exists(outdir):
        if not overwrite:
            sys.exit("Output directory {} exists — use --overwrite to "
                     "proceed".format(outdir))
        if not os.path.isdir(outdir):
            raise NotADirectoryError(
                "{} exists and is not a directory".format(outdir))
    else:
        os.makedirs(outdir, exist_ok=True)


def select_jax_platform(device):
    """Configure JAX for a CLI --device value: "cpu" forces the CPU
    platform, an integer index pins the default device, "tpu" leaves the
    default.  Also honors an explicit JAX_PLATFORMS=cpu environment
    variable — this environment's site hook imports jax first and stomps
    the env var, so standard behavior must be restored via the config
    API.  Shared by every accelerator-aware CLI.
    """
    import jax
    if device == "cpu" or os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif isinstance(device, int):
        jax.config.update("jax_default_device", jax.devices()[device])


def formatted_env_info(device=None):
    """Provenance header for model.log (reference: helpers.py:455-473)."""
    import jax
    lines = [
        "* Taiyaki-TPU version {}".format(__version__),
        "* Platform is {}".format(platform.platform()),
        "* Python is {}".format(sys.executable),
        "* Python version is {}".format(sys.version.replace("\n", " ")),
        "* JAX version {}".format(jax.__version__),
        "* Devices: {}".format(jax.devices()),
        "* Command line:",
        "* \"" + " ".join(sys.argv) + "\"",
        "* Started on {}".format(time.strftime("%c")),
    ]
    if device is not None:
        lines.insert(6, "* Using device {}".format(device))
    return "\n".join(lines) + "\n"
