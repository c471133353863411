#!/usr/bin/env python3
"""Convert a reference (taiyaki/torch) checkpoint into a taiyaki_tpu
checkpoint.

Enables reuse of published taiyaki models — e.g. the shipped remapping
model (models/mGru_flipflop_remapping_model_r9_DNA.checkpoint) — inside
this framework.  Torch tensors are extracted from the pickled module's
state_dict; no torch execution is performed (old checkpoints don't run
under modern torch anyway).

Usage:
    import_torch_checkpoint.py reference.checkpoint out.checkpoint \
        [--reference_repo /root/reference]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from taiyaki_tpu import MODEL_VERSION  # noqa: E402


def tolerant_torch_load(path, reference_repo):
    """Load a legacy taiyaki torch checkpoint across torch versions."""
    sys.path.insert(0, reference_repo)
    np.NAN = np.nan  # reference predates numpy 2
    import torch
    from torch.nn.modules import rnn as rnn_mod

    def tolerant_setstate(self, d):
        torch.nn.Module.__setstate__(self, d)
        if not hasattr(self, "_flat_weights_names"):
            self._flat_weights_names = [
                n for group in self._all_weights for n in group]
        self._init_flat_weights()

    rnn_mod.RNNBase.__setstate__ = tolerant_setstate
    return torch.load(path, map_location="cpu", weights_only=False)


def convert_layer(ref_layer):
    """Recursively convert a reference torch layer into (model-source
    fragment, params pytree)."""
    import torch  # noqa: F401
    name = type(ref_layer).__name__

    def t2n(t):
        return np.ascontiguousarray(t.detach().cpu().numpy()
                                    .astype(np.float32))

    if name == "Serial":
        subs = [convert_layer(l) for l in ref_layer.sublayers]
        src = "layers.Serial([{}])".format(", ".join(s[0] for s in subs))
        return src, {"sublayers": [s[1] for s in subs]}
    if name == "Reverse":
        src, p = convert_layer(ref_layer.layer)
        return "layers.Reverse({})".format(src), {"layer": p}
    if name == "Residual":
        src, p = convert_layer(ref_layer.layer)
        return "layers.Residual({})".format(src), {"layer": p}
    if name == "Parallel":
        subs = [convert_layer(l) for l in ref_layer.sublayers]
        return ("layers.Parallel([{}])".format(
            ", ".join(s[0] for s in subs)),
            {"sublayers": [s[1] for s in subs]})
    if name == "Convolution":
        # non-default padding must ride along or output length changes;
        # the reference stores it as a ConstantPad1d module
        pad_mod = getattr(ref_layer, "pad", None)
        pad = (tuple(pad_mod.padding) if pad_mod is not None
               else (ref_layer.winlen // 2, (ref_layer.winlen - 1) // 2))
        default_pad = (ref_layer.winlen // 2, (ref_layer.winlen - 1) // 2)
        pad_src = "" if pad == default_pad else ", pad={}".format(pad)
        src = ("layers.Convolution({}, {}, {}, stride={}, "
               "has_bias={}{}, fun=activation.{})".format(
                   ref_layer.insize, ref_layer.size, ref_layer.winlen,
                   ref_layer.stride, ref_layer.has_bias, pad_src,
                   ref_layer.activation.__name__))
        p = {"W": t2n(ref_layer.conv.weight)}
        if ref_layer.has_bias:
            p["b"] = t2n(ref_layer.conv.bias)
        return src, p
    if name == "GruMod":
        has_bias = bool(getattr(ref_layer, "has_bias", True))
        src = "layers.GruMod({}, {}, has_bias={})".format(
            ref_layer.insize, ref_layer.size, has_bias)
        p = {"iW": t2n(ref_layer.cudnn_gru.weight_ih_l0),
             "sW": t2n(ref_layer.cudnn_gru.weight_hh_l0)}
        # our GruMod keeps a (zero, untrained) b leaf when has_bias=False
        p["b"] = (t2n(ref_layer.cudnn_gru.bias_ih_l0) if has_bias
                  else np.zeros(3 * ref_layer.size, dtype=np.float32))
        return src, p
    if name == "Lstm":
        has_bias = bool(getattr(ref_layer, "has_bias", True))
        src = "layers.Lstm({}, {}, has_bias={})".format(
            ref_layer.insize, ref_layer.size, has_bias)
        p = {"iW": t2n(ref_layer.lstm.weight_ih_l0),
             "sW": t2n(ref_layer.lstm.weight_hh_l0)}
        p["b"] = (t2n(ref_layer.lstm.bias_ih_l0) if has_bias
                  else np.zeros(4 * ref_layer.size, dtype=np.float32))
        return src, p
    if name == "FeedForward":
        src = ("layers.FeedForward({}, {}, has_bias={}, "
               "fun=activation.{})".format(
                   ref_layer.insize, ref_layer.size, ref_layer.has_bias,
                   ref_layer.activation.__name__))
        p = {"W": t2n(ref_layer.linear.weight)}
        if ref_layer.has_bias:
            p["b"] = t2n(ref_layer.linear.bias)
        return src, p
    if name == "GlobalNormFlipFlop":
        src = "layers.GlobalNormFlipFlop({}, {}, has_bias={})".format(
            ref_layer.insize, ref_layer.nbase, ref_layer.has_bias)
        p = {"W": t2n(ref_layer.linear.weight)}
        if ref_layer.has_bias:
            p["b"] = t2n(ref_layer.linear.bias)
        return src, p
    if name == "GlobalNormFlipFlopCatMod":
        raise NotImplementedError(
            "cat_mod import: reconstruct via AlphabetInfo then copy W/b")
    raise NotImplementedError("Layer conversion for {}".format(name))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", help="reference .checkpoint (torch)")
    parser.add_argument("output", help="taiyaki_tpu .checkpoint")
    parser.add_argument("--reference_repo", default="/root/reference")
    args = parser.parse_args()

    net = tolerant_torch_load(args.input, args.reference_repo)
    src_expr, params = convert_layer(net)
    model_source = (
        "from taiyaki_tpu import activation, layers\n\n\n"
        "def network(**kwargs):\n"
        "    return {}\n".format(src_expr))
    metadata = dict(getattr(net, "metadata", {}) or {})
    metadata["version"] = MODEL_VERSION
    metadata.setdefault("reverse", False)
    metadata.setdefault("standardize", True)
    ckpt = {
        "model_source": model_source,
        "model_kwargs": {},
        "params": params,
        "optimizer_state": None,
        "metadata": metadata,
    }
    with open(args.output, "wb") as fh:
        pickle.dump(ckpt, fh)
    print("Wrote", args.output)


if __name__ == "__main__":
    main()
