"""Model layer library — functional JAX modules with Guppy JSON export.

Design: a layer is a *static* Python object holding configuration only;
parameters live in a separate pytree (nested dicts of arrays) produced by
`layer.init(rng)` and consumed by `layer.apply(params, x)`.  This is the
idiomatic JAX split (config is trace-static, params are traced), so a whole
network jits as `jax.jit(partial(net.apply))` and shards with pjit without
any module-system machinery.

Tensor convention: time x batch x features (TBF) throughout, matching the
reference (taiyaki/layers.py:14).

TPU notes:
* RNN layers hoist the input projection out of the time scan: one large
  [T*B, insize] @ [insize, k*size] MXU matmul computes all per-step input
  gates, and the `lax.scan` carries only the recurrent matmul.  This is the
  standard recipe for making small-RNN scans MXU-bound instead of
  latency-bound.
* Convolution uses `lax.conv_general_dilated` in NWC layout (the TPU-native
  conv layout) with the reference's asymmetric default padding
  (winlen//2, (winlen-1)//2) (taiyaki/layers.py:744-850).

JSON schema: each layer's `json(params)` emits the same structure as the
reference's per-layer `.json()` methods so exported models load in Guppy.
Reference citations are given per class.  One deliberate fix: the reference
accidentally omits 'W' from params when has_bias=False (operator-precedence
bug in e.g. taiyaki/layers.py:322-326); we always export W.
"""

import os
from collections import OrderedDict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from taiyaki_tpu import activation, flipflopfings


# -- initialisers ------------------------------------------------------------

def random_orthonormal(rng, n, m=None):
    """Random n x m orthonormal matrix (m >= n) via QR of Gaussian noise
    with Mezzadri sign correction (reference: taiyaki/layers.py:37-68)."""
    m = n if m is None else m
    assert m >= n
    x = rng.standard_normal((m, m))
    q, r = np.linalg.qr(x)
    q = q * np.sign(np.diag(r))[None, :]
    return q[:n, :]


def orthonormal_matrix(rng, nrow, ncol):
    """Rectangular orthonormal-ish init: stack square orthonormal chunks
    (reference: taiyaki/layers.py:71-96)."""
    nrep = nrow // ncol
    out = np.zeros((nrow, ncol), dtype=np.float32)
    for i in range(nrep):
        out[i * ncol:(i + 1) * ncol] = random_orthonormal(rng, ncol)
    rem = nrow - nrep * ncol
    if rem > 0:
        out[nrep * ncol:] = random_orthonormal(rng, rem, ncol)
    return out


def truncated_normal(rng, shape, sd):
    """Truncated normal (+-2 sd) for vector params
    (reference: taiyaki/layers.py:99-114)."""
    out = np.empty(shape, dtype=np.float32).reshape(-1)
    filled = 0
    while filled < out.size:
        draw = rng.standard_normal(out.size * 2)
        draw = draw[np.abs(draw) < 2.0]
        take = min(out.size - filled, draw.size)
        out[filled:filled + take] = draw[:take]
        filled += take
    return (sd * out).reshape(shape)


def _as_np(x):
    return np.asarray(x, dtype=np.float32)


# -- base --------------------------------------------------------------------

class Layer:
    """Base class: static config; params as pytrees.

    Subclasses define init/apply/json.  `insize`/`size` attributes give
    feature counts; `stride` gives the time down-sampling factor (1 unless
    overridden).
    """

    stride = 1

    def init(self, rng):
        """Initialise parameters.  rng is a numpy Generator."""
        return {}

    def apply(self, params, x):
        raise NotImplementedError

    def json(self, params):
        raise NotImplementedError

    def __call__(self, params, x):
        return self.apply(params, x)


def _linear_init(rng, size, insize, has_bias):
    params = {"W": orthonormal_matrix(rng, size, insize)}
    if has_bias:
        params["b"] = truncated_normal(rng, (size,), sd=0.5)
    return params


def _linear_apply(params, x, has_bias):
    y = x @ params["W"].T
    if has_bias:
        y = y + params["b"]
    return y


def _linear_json_params(params, has_bias):
    out = OrderedDict([("W", _as_np(params["W"]))])
    if has_bias:
        out["b"] = _as_np(params["b"])
    return out


# -- simple feature layers ---------------------------------------------------

class FeedForward(Layer):
    """out = fun(x W + b)  (reference: taiyaki/layers.py:249-327)."""

    def __init__(self, insize, size, has_bias=True, fun=activation.linear):
        self.insize = insize
        self.size = size
        self.has_bias = has_bias
        self.activation = fun

    def init(self, rng):
        return _linear_init(rng, self.size, self.insize, self.has_bias)

    def apply(self, params, x):
        return self.activation(_linear_apply(params, x, self.has_bias))

    def json(self, params):
        return OrderedDict([
            ("type", "feed-forward"),
            ("activation", self.activation.__name__),
            ("size", self.size),
            ("insize", self.insize),
            ("bias", self.has_bias),
            ("params", _linear_json_params(params, self.has_bias))])


class Softmax(Layer):
    """Log-softmax of a linear transform
    (reference: taiyaki/layers.py:328-403)."""

    def __init__(self, insize, size, has_bias=True):
        self.insize = insize
        self.size = size
        self.has_bias = has_bias

    def init(self, rng):
        return _linear_init(rng, self.size, self.insize, self.has_bias)

    def apply(self, params, x):
        return jax.nn.log_softmax(
            _linear_apply(params, x, self.has_bias), axis=-1)

    def json(self, params):
        res = OrderedDict([("type", "softmax"),
                           ("size", self.size),
                           ("insize", self.insize),
                           ("bias", self.has_bias)])
        res["params"] = _linear_json_params(params, self.has_bias)
        return res


class TimeLinear(Layer):
    """Linear transform over the *time* dimension
    (reference: taiyaki/layers.py:1659-1737)."""

    def __init__(self, insize, size, has_bias=True, fun=activation.linear):
        self.insize = insize   # number of time points in
        self.size = size       # number of time points out
        self.has_bias = has_bias
        self.activation = fun

    def init(self, rng):
        return _linear_init(rng, self.size, self.insize, self.has_bias)

    def apply(self, params, x):
        # x: [T, B, F]; transform acts on T.
        xp = jnp.transpose(x, (1, 2, 0))          # [B, F, T]
        y = _linear_apply(params, xp, self.has_bias)
        y = self.activation(y)
        return jnp.transpose(y, (2, 0, 1))

    def json(self, params):
        res = OrderedDict([("type", "TimeLinear"),
                           ("activation", self.activation.__name__),
                           ("size", self.size),
                           ("insize", self.insize),
                           ("bias", self.has_bias)])
        res["params"] = _linear_json_params(params, self.has_bias)
        return res


class Identity(Layer):
    """Elementwise activation only (reference: taiyaki/layers.py:1050-1088)."""

    def __init__(self, fun=activation.linear):
        self.fun = fun

    def apply(self, params, x):
        return self.fun(x)

    def json(self, params):
        return OrderedDict([("type", "Identity"),
                            ("activation", self.fun.__name__)])


class Studentise(Layer):
    """Normalize each feature over (time, batch)
    (reference: taiyaki/layers.py:1090-1131)."""

    def __init__(self, epsilon=1e-4):
        self.epsilon = epsilon

    def apply(self, params, x):
        m = jnp.mean(x, axis=(0, 1), keepdims=True)
        v = jnp.var(x, axis=(0, 1), keepdims=True)
        return (x - m) / jnp.sqrt(v + self.epsilon)

    def json(self, params):
        return {"type": "studentise"}


class DeltaSample(Layer):
    """Difference of neighbouring time samples, zero-padded at the end
    (reference: taiyaki/layers.py:1133-1160)."""

    def apply(self, params, x):
        d = x[1:] - x[:-1]
        return jnp.concatenate([d, jnp.zeros_like(x[:1])], axis=0)

    def json(self, params):
        return OrderedDict([("type", "DeltaSample")])


class Window(Layer):
    """Sliding window over time, stacked on the feature axis
    (reference: taiyaki/layers.py:1178-1222)."""

    def __init__(self, w):
        assert w > 0, "Window size must be positive"
        assert w % 2 == 1, "Window size should be odd"
        self.w = w

    def apply(self, params, x):
        length = x.shape[0]
        pad = self.w // 2
        zeros = jnp.zeros((pad,) + x.shape[1:], x.dtype)
        padded = jnp.concatenate([zeros, x, zeros], axis=0)
        xs = [padded[i:length + i] for i in range(self.w)]
        return jnp.concatenate(xs, axis=-1)

    def json(self, params):
        res = OrderedDict([("type", "window")])
        res["params"] = OrderedDict([("w", self.w)])
        return res


class UpSample(Layer):
    """(T, B, F) -> (T*nfold, B, F/nfold)
    (reference: taiyaki/layers.py:1739-1781)."""

    def __init__(self, nfold):
        self.nfold = nfold

    def apply(self, params, x):
        nt, nb, nf = x.shape
        assert nf % self.nfold == 0
        y = jnp.transpose(x, (1, 0, 2)).reshape(
            nb, nt * self.nfold, nf // self.nfold)
        return jnp.transpose(y, (1, 0, 2))

    def json(self, params):
        return OrderedDict([("type", "UpSample"), ("nfold", self.nfold)])


class DownSample(Layer):
    """(T, B, F) -> (T/nfold, B, F*nfold)
    (reference: taiyaki/layers.py:1783-1829)."""

    def __init__(self, nfold):
        self.nfold = nfold

    def apply(self, params, x):
        nt, nb, nf = x.shape
        assert nt % self.nfold == 0
        y = jnp.transpose(x, (1, 0, 2)).reshape(
            nb, nt // self.nfold, nf * self.nfold)
        return jnp.transpose(y, (1, 0, 2))

    def json(self, params):
        return OrderedDict([("type", "DownSample"), ("nfold", self.nfold)])


# -- combinators -------------------------------------------------------------

class Serial(Layer):
    """Apply layers in sequence (reference: taiyaki/layers.py:944-983)."""

    def __init__(self, layers):
        self.sublayers = list(layers)

    @property
    def insize(self):
        return self.sublayers[0].insize

    @property
    def size(self):
        return self.sublayers[-1].size

    @property
    def stride(self):
        s = 1
        for layer in self.sublayers:
            s *= getattr(layer, "stride", 1)
        return s

    def init(self, rng):
        return {"sublayers": [l.init(rng) for l in self.sublayers]}

    def apply(self, params, x):
        # TAIYAKI_TPU_REMAT=1 (trainer --remat) wraps every sublayer in
        # jax.checkpoint: activations/residuals between layers are not
        # saved for the backward pass — each layer's forward re-runs
        # during backprop instead.  Trades ~1 extra forward of compute
        # for dropping the per-layer residual streams from peak HBM,
        # unlocking batch/chunk sizes past the documented capacity wall
        # (docs/performance.md: bs1024 @ chunk 4000 needs ~18GB vs
        # 15.75GB available).  Trace-time constant.
        remat = os.environ.get("TAIYAKI_TPU_REMAT") == "1"
        for layer, p in zip(self.sublayers, params["sublayers"]):
            f = jax.checkpoint(layer.apply) if remat else layer.apply
            x = f(p, x)
        return x

    def json(self, params):
        return OrderedDict([
            ("type", "serial"),
            ("sublayers", [l.json(p) for l, p in
                           zip(self.sublayers, params["sublayers"])])])


class Parallel(Layer):
    """Apply layers to the same input; concatenate on features
    (reference: taiyaki/layers.py:853-895)."""

    def __init__(self, layers):
        self.sublayers = list(layers)

    @property
    def insize(self):
        return self.sublayers[0].insize

    @property
    def size(self):
        return sum(l.size for l in self.sublayers)

    @property
    def stride(self):
        # branches consume the same input and their outputs are combined
        # time-aligned, so all sublayer strides must agree
        strides = {getattr(l, "stride", 1) for l in self.sublayers}
        assert len(strides) == 1, (
            "sublayers disagree on stride: {}".format(sorted(strides)))
        return strides.pop()

    def init(self, rng):
        return {"sublayers": [l.init(rng) for l in self.sublayers]}

    def apply(self, params, x):
        ys = [l.apply(p, x)
              for l, p in zip(self.sublayers, params["sublayers"])]
        return jnp.concatenate(ys, axis=2)

    def json(self, params):
        return OrderedDict([
            ("type", "parallel"),
            ("sublayers", [l.json(p) for l, p in
                           zip(self.sublayers, params["sublayers"])])])


class Product(Layer):
    """Elementwise product of layer outputs
    (reference: taiyaki/layers.py:897-942)."""

    def __init__(self, layers):
        self.sublayers = list(layers)

    @property
    def insize(self):
        return self.sublayers[0].insize

    @property
    def size(self):
        return self.sublayers[0].size

    @property
    def stride(self):
        # branches consume the same input and their outputs are combined
        # time-aligned, so all sublayer strides must agree
        strides = {getattr(l, "stride", 1) for l in self.sublayers}
        assert len(strides) == 1, (
            "sublayers disagree on stride: {}".format(sorted(strides)))
        return strides.pop()

    def init(self, rng):
        return {"sublayers": [l.init(rng) for l in self.sublayers]}

    def apply(self, params, x):
        y = self.sublayers[0].apply(params["sublayers"][0], x)
        for layer, p in zip(self.sublayers[1:], params["sublayers"][1:]):
            y = y * layer.apply(p, x)
        return y

    def json(self, params):
        return OrderedDict([
            ("type", "Product"),
            ("sublayers", [l.json(p) for l, p in
                           zip(self.sublayers, params["sublayers"])])])


class Reverse(Layer):
    """Run the enclosed layer backwards in time
    (reference: taiyaki/layers.py:117-154)."""

    def __init__(self, layer):
        self.layer = layer

    @property
    def insize(self):
        return self.layer.insize

    @property
    def size(self):
        return self.layer.size

    @property
    def stride(self):
        return getattr(self.layer, "stride", 1)

    def init(self, rng):
        return {"layer": self.layer.init(rng)}

    def apply(self, params, x):
        # Recurrent layers take the time direction as a kernel argument,
        # which skips materializing flipped copies of the [T,B,H] streams
        # in HBM (numerics are identical: same per-step arithmetic).
        if isinstance(self.layer, (Lstm, GruMod)):
            return self.layer.apply(params["layer"], x, reverse=True)
        y = self.layer.apply(params["layer"], jnp.flip(x, axis=0))
        return jnp.flip(y, axis=0)

    def json(self, params):
        return OrderedDict([("type", "reverse"),
                            ("sublayers", self.layer.json(params["layer"]))])


class Residual(Layer):
    """x + layer(x) (reference: taiyaki/layers.py:156-196)."""

    def __init__(self, layer):
        self.layer = layer

    @property
    def insize(self):
        return self.layer.insize

    @property
    def size(self):
        return self.layer.size

    def init(self, rng):
        return {"layer": self.layer.init(rng)}

    def apply(self, params, x):
        return x + self.layer.apply(params["layer"], x)

    def json(self, params):
        return OrderedDict([("type", "Residual"),
                            ("sublayers", self.layer.json(params["layer"]))])


class GatedResidual(Layer):
    """sigmoid(alpha)*x + (1-sigmoid(alpha))*layer(x)
    (reference: taiyaki/layers.py:198-247)."""

    def __init__(self, layer, gate_init=0.0):
        self.layer = layer
        self.gate_init = gate_init

    @property
    def insize(self):
        return self.layer.insize

    @property
    def size(self):
        return self.layer.size

    def init(self, rng):
        return {"alpha": np.array([self.gate_init], dtype=np.float32),
                "layer": self.layer.init(rng)}

    def apply(self, params, x):
        gate = jax.nn.sigmoid(params["alpha"][0])
        y = self.layer.apply(params["layer"], x)
        return gate * x + (1.0 - gate) * y

    def json(self, params):
        res = OrderedDict([("type", "GatedResidual"),
                           ("sublayers", self.layer.json(params["layer"]))])
        res["params"] = OrderedDict(
            [("alpha", float(np.asarray(params["alpha"])[0]))])
        return res


class SoftChoice(Layer):
    """Softmax-weighted mixture of layer outputs
    (reference: taiyaki/layers.py:985-1028)."""

    def __init__(self, layers):
        self.sublayers = list(layers)

    @property
    def insize(self):
        return self.sublayers[0].insize

    @property
    def size(self):
        return self.sublayers[0].size

    @property
    def stride(self):
        # branches consume the same input and their outputs are combined
        # time-aligned, so all sublayer strides must agree
        strides = {getattr(l, "stride", 1) for l in self.sublayers}
        assert len(strides) == 1, (
            "sublayers disagree on stride: {}".format(sorted(strides)))
        return strides.pop()

    def init(self, rng):
        return {"alpha": np.zeros(len(self.sublayers), dtype=np.float32),
                "sublayers": [l.init(rng) for l in self.sublayers]}

    def apply(self, params, x):
        ps = jax.nn.softmax(params["alpha"], axis=0)
        ys = [p * l.apply(sp, x) for p, l, sp in
              zip(ps, self.sublayers, params["sublayers"])]
        return sum(ys[1:], start=ys[0])

    def json(self, params):
        res = OrderedDict([
            ("type", "softchoice"),
            ("sublayers", [l.json(p) for l, p in
                           zip(self.sublayers, params["sublayers"])])])
        res["params"] = OrderedDict([("alpha", _as_np(params["alpha"]))])
        return res


def birnn(forward, backward):
    """Bidirectional RNN: parallel forward and time-reversed layers
    (reference: taiyaki/layers.py:1224-1235)."""
    return Parallel([forward, Reverse(backward)])


# -- convolution -------------------------------------------------------------

class Convolution(Layer):
    """1D convolution over time, TBF in / TBF out
    (reference: taiyaki/layers.py:744-850).

    Weight layout [size, insize, winlen] (matches the reference's torch
    Conv1d export so JSON is bit-compatible).  Default padding
    (winlen//2, (winlen-1)//2) keeps output length independent of winlen.
    """

    def __init__(self, insize, size, winlen, stride=1, pad=None,
                 fun=activation.tanh, has_bias=True):
        self.insize = insize
        self.size = size
        self.winlen = winlen
        self.stride = stride
        if pad is None:
            pad = (winlen // 2, (winlen - 1) // 2)
        self.padding = pad
        self.activation = fun
        self.has_bias = has_bias

    def init(self, rng):
        w = orthonormal_matrix(rng, self.size, self.insize * self.winlen)
        params = {"W": w.reshape(self.size, self.insize, self.winlen)}
        if self.has_bias:
            params["b"] = truncated_normal(rng, (self.size,), sd=0.5)
        return params

    def apply(self, params, x):
        # [T, B, F] -> NWC [B, T, F]
        lhs = jnp.transpose(x, (1, 0, 2))
        rhs = jnp.transpose(params["W"], (2, 1, 0))   # [winlen, in, out]
        y = jax.lax.conv_general_dilated(
            lhs, rhs,
            window_strides=(self.stride,),
            padding=[self.padding],
            dimension_numbers=("NWC", "WIO", "NWC"))
        if self.has_bias:
            y = y + params["b"]
        return self.activation(jnp.transpose(y, (1, 0, 2)))

    def json(self, params):
        res = OrderedDict([("type", "convolution"),
                           ("insize", self.insize),
                           ("size", self.size),
                           ("bias", self.has_bias),
                           ("winlen", self.winlen),
                           ("stride", self.stride),
                           ("padding", self.padding),
                           ("activation", self.activation.__name__)])
        res["params"] = _linear_json_params(params, self.has_bias)
        return res


# -- recurrent layers --------------------------------------------------------

def _rnn_scan(step, h0, gates_x):
    """Scan a recurrence over precomputed input gates [T, B, k*H]."""
    _, ys = jax.lax.scan(step, h0, gates_x)
    return ys


class Lstm(Layer):
    """LSTM over time (reference: taiyaki/layers.py:491-607).

    Semantics match torch nn.LSTM with the redundant hidden bias pinned to
    zero (reference _disable_state_bias, layers.py:522-532).  Gate order in
    the stacked weights is torch's (i, f, g, o); the JSON export reshapes to
    (4, size, insize) exactly as the reference does.
    """

    def __init__(self, insize, size, has_bias=True):
        self.insize = insize
        self.size = size
        self.has_bias = has_bias

    def init(self, rng):
        params = {
            "iW": orthonormal_matrix(rng, 4 * self.size, self.insize),
            "sW": orthonormal_matrix(rng, 4 * self.size, self.size),
        }
        if self.has_bias:
            params["b"] = truncated_normal(rng, (4 * self.size,), sd=0.5)
        else:
            params["b"] = np.zeros(4 * self.size, dtype=np.float32)
        return params

    def apply(self, params, x, reverse=False):
        # whole layer incl. the gate GEMM: on TPU the gates are computed
        # inside the Pallas kernel (no [T,B,4H] HBM round trip)
        from taiyaki_tpu.ops.rnn import lstm_layer
        # has_bias=False keeps the zero 'b' leaf (uniform kernel
        # signature) but blocks its gradient: "initialised to zero and
        # not trained" (reference layers.py:271-272)
        b = (params["b"] if self.has_bias
             else jax.lax.stop_gradient(params["b"]))
        return lstm_layer(x, params["iW"], b, params["sW"],
                          reverse=reverse)

    def json(self, params):
        res = OrderedDict([("type", "LSTM"),
                           ("activation", "tanh"),
                           ("gate", "sigmoid"),
                           ("size", self.size),
                           ("insize", self.insize),
                           ("bias", self.has_bias)])
        res["params"] = OrderedDict([
            ("iW", _as_np(params["iW"]).reshape(4, self.size, self.insize)),
            ("sW", _as_np(params["sW"]).reshape(4, self.size, self.size)),
            ("b", _as_np(params["b"]).reshape(4, self.size))])
        return res


def _cudnn_to_guppy_gru(p):
    """Reorder stacked GRU gates from CUDNN (r, z, n) to Guppy (z, r, n)
    (reference: taiyaki/layers.py:728-741)."""
    k = p.shape[0] // 3
    return np.concatenate([p[k:2 * k], p[:k], p[2 * k:]], axis=0)


class GruMod(Layer):
    """Guppy-compatible GRU (reference: taiyaki/layers.py:609-726).

    torch/CUDNN GRU semantics with the redundant hidden bias pinned to zero:
        r = sigmoid(x W_r + b_r + h U_r)
        z = sigmoid(x W_z + b_z + h U_z)
        n = tanh(x W_n + b_n + r * (h U_n))
        h' = (1 - z) n + z h
    Stored gate order is CUDNN's (r, z, n); JSON export reorders to Guppy's
    (z, r, n) via _cudnn_to_guppy_gru.
    """

    def __init__(self, insize, size, has_bias=True):
        self.insize = insize
        self.size = size
        self.has_bias = has_bias

    def init(self, rng):
        params = {
            "iW": orthonormal_matrix(rng, 3 * self.size, self.insize),
            "sW": orthonormal_matrix(rng, 3 * self.size, self.size),
        }
        if self.has_bias:
            params["b"] = truncated_normal(rng, (3 * self.size,), sd=0.5)
        else:
            params["b"] = np.zeros(3 * self.size, dtype=np.float32)
        return params

    def apply(self, params, x, reverse=False):
        from taiyaki_tpu.ops.rnn import gru_layer
        # see Lstm.apply on has_bias=False
        b = (params["b"] if self.has_bias
             else jax.lax.stop_gradient(params["b"]))
        return gru_layer(x, params["iW"], b, params["sW"],
                         reverse=reverse)

    def json(self, params):
        res = OrderedDict([("type", "GruMod"),
                           ("activation", "tanh"),
                           ("gate", "sigmoid"),
                           ("size", self.size),
                           ("insize", self.insize),
                           ("bias", self.has_bias)])
        iW = _cudnn_to_guppy_gru(_as_np(params["iW"]))
        sW = _cudnn_to_guppy_gru(_as_np(params["sW"]))
        b = _cudnn_to_guppy_gru(_as_np(params["b"]))
        res["params"] = OrderedDict([
            ("iW", iW.reshape(3, self.size, self.insize)),
            ("sW", sW.reshape(3, self.size, self.size)),
            ("b", b.reshape(3, self.size))])
        return res


class CudnnGru(Layer):
    """GRU with both input and state biases (reference:
    taiyaki/layers.py:404-489).  Differs from GruMod by the extra state
    bias inside the candidate gate."""

    def __init__(self, insize, size, has_bias=True):
        self.insize = insize
        self.size = size
        self.has_bias = has_bias

    def init(self, rng):
        params = {
            "iW": orthonormal_matrix(rng, 3 * self.size, self.insize),
            "sW": orthonormal_matrix(rng, 3 * self.size, self.size),
        }
        if self.has_bias:
            params["ib"] = truncated_normal(rng, (3 * self.size,), sd=0.5)
            params["sb"] = truncated_normal(rng, (3 * self.size,), sd=0.5)
        else:
            # zero and not trained (see Lstm.apply)
            params["ib"] = np.zeros(3 * self.size, dtype=np.float32)
            params["sb"] = np.zeros(3 * self.size, dtype=np.float32)
        return params

    def apply(self, params, x):
        T, B, _ = x.shape
        H = self.size
        ib, sb = params["ib"], params["sb"]
        if not self.has_bias:
            ib = jax.lax.stop_gradient(ib)
            sb = jax.lax.stop_gradient(sb)
        gates_x = x @ params["iW"].T + ib

        def step(h, gx):
            gh = h @ params["sW"].T + sb
            r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
            z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
            n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
            h2 = (1.0 - z) * n + z * h
            return h2, h2

        h0 = jnp.zeros((B, H), x.dtype)
        return _rnn_scan(step, h0, gates_x)

    def json(self, params):
        res = OrderedDict([("type", "CudnnGru"),
                           ("activation", "tanh"),
                           ("gate", "sigmoid"),
                           ("size", self.size),
                           ("insize", self.insize),
                           ("bias", self.has_bias),
                           ("state0", False)])
        res["params"] = OrderedDict([
            ("iW", _cudnn_to_guppy_gru(_as_np(params["iW"])).reshape(
                3, self.size, self.insize)),
            ("sW", _cudnn_to_guppy_gru(_as_np(params["sW"])).reshape(
                3, self.size, self.size)),
            ("ib", _cudnn_to_guppy_gru(_as_np(params["ib"])).reshape(
                3, self.size)),
            ("sb", _cudnn_to_guppy_gru(_as_np(params["sb"])).reshape(
                3, self.size))])
        return res


# -- output heads ------------------------------------------------------------

class GlobalNormFlipFlop(Layer):
    """Flip-flop transition score head: scale * fun(x W + b)
    (reference: taiyaki/layers.py:1316-1412).  Global normalisation is the
    loss function's responsibility (flipflop_logz)."""

    def __init__(self, insize, nbase, has_bias=True, fun=activation.tanh,
                 scale=5.0):
        self.insize = insize
        self.nbase = nbase
        self.size = flipflopfings.nstate_flipflop(nbase)
        self.has_bias = has_bias
        self.activation = fun
        self.scale = scale

    def init(self, rng):
        return _linear_init(rng, self.size, self.insize, self.has_bias)

    def apply(self, params, x):
        return self.scale * self.activation(
            _linear_apply(params, x, self.has_bias))

    def json(self, params):
        res = OrderedDict([
            ("type", "GlobalNormTwoState"),
            ("size", self.size),
            ("insize", self.insize),
            ("bias", self.has_bias),
            ("scale", self.scale),
            ("activation", self.activation.__name__)])
        res["params"] = _linear_json_params(params, self.has_bias)
        return res


class GlobalNormFlipFlopCatMod(Layer):
    """Flip-flop head with categorical modified-base score stream
    (reference: taiyaki/layers.py:1414-1640).

    Output = [2*nbase*(nbase+1) transition scores (5*tanh)] ++
             [grouped log-softmax mod stream, width ncan_base + nmod_base].

    External-contract attributes (stable names, used by Guppy/megalodon):
    can_nmods, output_alphabet, ordered_mod_long_names, can_mods_offsets.
    """

    def __init__(self, insize, alphabet_info, has_bias=True):
        self.insize = insize
        self.has_bias = has_bias

        self.alphabet = alphabet_info.alphabet
        self.collapse_alphabet = alphabet_info.collapse_alphabet
        self.mod_long_names = alphabet_info.mod_long_names
        self.mod_name_conv = alphabet_info.mod_name_conv
        self.can_bases = alphabet_info.can_bases
        self.mod_bases = alphabet_info.mod_bases
        self.ncan_base = alphabet_info.ncan_base
        self.nmod_base = alphabet_info.nmod_base

        self.ntrans_states = 2 * self.ncan_base * (self.ncan_base + 1)
        self._compute_label_conversions()
        self._compute_mods_info()

        # Raw linear output: trans states + single canonical category + mods.
        self.size = self.ntrans_states + 1 + self.nmod_base

    @property
    def nbase(self):
        return self.ncan_base

    def _compute_label_conversions(self):
        """Tables mapping alphabet labels -> (canonical label, mod label)
        (reference: layers.py:1441-1460)."""
        can_labels, mod_labels = [], []
        per_can_count = {b: 0 for b in self.can_bases}
        for b, can_b in zip(self.alphabet, self.collapse_alphabet):
            can_labels.append(self.can_bases.find(can_b))
            if b in self.can_bases:
                mod_labels.append(0)
            else:
                per_can_count[can_b] += 1
                mod_labels.append(per_can_count[can_b])
        self.can_labels = np.array(can_labels)
        self.mod_labels = np.array(mod_labels)

    def _compute_mods_info(self):
        """Output ordering info (reference: layers.py:1462-1505)."""
        self.output_alphabet = ""
        for can_b in self.can_bases:
            self.output_alphabet += can_b
            for b, can_bi in zip(self.alphabet, self.collapse_alphabet):
                if can_bi == can_b and b != can_b:
                    self.output_alphabet += b
        self.ordered_mod_long_names = (
            None if self.mod_long_names is None else
            [self.mod_name_conv[b] for b in self.alphabet
             if b in self.mod_bases])
        self.can_nmods = np.array(
            [sum(b == can_b for b in self.collapse_alphabet) - 1
             for can_b in self.can_bases])
        self.can_mods_offsets = np.cumsum(
            np.concatenate([[0], self.can_nmods + 1])).astype(np.int32)
        # Raw-linear-output columns for each canonical group: the shared
        # canonical score (column 0) plus that base's mod columns.
        self.can_indices = []
        curr = 0
        for nmod in self.can_nmods:
            self.can_indices.append(
                np.concatenate([[0], np.arange(curr + 1, curr + 1 + nmod)]))
            curr += nmod
        # Output width after grouped softmax.
        self.out_size = self.ntrans_states + self.ncan_base + self.nmod_base

    def init(self, rng):
        return _linear_init(rng, self.size, self.insize, self.has_bias)

    def apply(self, params, x):
        y = _linear_apply(params, x, self.has_bias)
        trans = 5.0 * jnp.tanh(y[..., :self.ntrans_states])
        raw_mods = y[..., self.ntrans_states:]
        groups = [jax.nn.log_softmax(raw_mods[..., idx], axis=-1)
                  for idx in self.can_indices]
        return jnp.concatenate([trans] + groups, axis=-1)

    def json(self, params):
        res = OrderedDict([
            ("type", "GlobalNormTwoStateCatMod"),
            ("size", self.size),
            ("insize", self.insize),
            ("bias", self.has_bias),
            ("can_nmods", self.can_nmods),
            ("output_alphabet", self.output_alphabet),
            ("modified_base_long_names", self.ordered_mod_long_names)])
        res["params"] = _linear_json_params(params, self.has_bias)
        return res


# -- model predicates & helpers ----------------------------------------------

def is_cat_mod_model(net):
    """True if the final layer is a cat_mod head
    (reference: taiyaki/layers.py:1643-1657)."""
    assert isinstance(net, Serial)
    return isinstance(net.sublayers[-1], GlobalNormFlipFlopCatMod)


def is_delta_model(net):
    """True if the first layer is DeltaSample
    (reference: taiyaki/layers.py:1162-1176)."""
    assert isinstance(net, Serial)
    return isinstance(net.sublayers[0], DeltaSample)


def DownUpSample(layer, nfold):
    """Wrap a layer between time down-/up-sampling reshapes
    (reference: taiyaki/layers.py:1831-1851)."""
    assert layer.size % nfold == 0
    return Serial([DownSample(nfold), layer, UpSample(nfold)])


def guess_model_stride(net, params, input_length=720):
    """Infer total time stride by probing with a zero input
    (reference: taiyaki/helpers.py:150-162, which probes a fixed
    (720, 1, 1) input; layers like DeltaSample define no insize)."""
    insize = getattr(net, "insize", 1)
    out = net.apply(params, jnp.zeros((input_length, 1, insize)))
    return int(round(input_length / out.shape[0]))
