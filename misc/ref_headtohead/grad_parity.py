#!/usr/bin/env python3
"""End-to-end gradient parity: full network + CRF loss vs torch autograd.

Loads the SAME initial checkpoint into (a) the reference's torch model
executing the reference's own layer code with the pinned pure-torch ctc
shim, and (b) this framework via the import converter; computes the
training loss and its gradient on the SAME batch; and reports per-leaf
relative error and cosine similarity.  This pins the WHOLE training
gradient (conv -> GRU stack -> global-norm -> CRF loss), not just the
loss kernels (tests/test_reference_kernel_parity.py covers those).

Usage:
  grad_parity.py ref_init.checkpoint mapped.hdf5 [--chunk_len 2000]
"""

import argparse
import importlib.util
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, os.pardir, os.pardir)
sys.path.insert(0, REPO)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def torch_grads(ckpt, batch, sharpen):
    """Loss + per-tensor grads from the reference's own torch layers."""
    import torch
    itc = _load(os.path.join(REPO, "misc", "import_torch_checkpoint.py"),
                "itc")
    sys.path.insert(0, HERE)
    import ctc_shim
    net = itc.tolerant_torch_load(ckpt, "/root/reference")
    net.train()

    indata = torch.tensor(np.asarray(batch.signal), dtype=torch.float32)
    seqs_cat = np.concatenate(
        [np.asarray(batch.seqs)[b, :n]
         for b, n in enumerate(np.asarray(batch.seqlens))])
    seqs_t = torch.tensor(seqs_cat, dtype=torch.long)
    seqlens_t = torch.tensor(np.asarray(batch.seqlens), dtype=torch.long)

    outputs = net(indata)
    nblk = float(outputs.shape[0])
    lossvector = ctc_shim.crf_flipflop_loss(
        outputs, seqs_t, seqlens_t, sharpen)
    sys.path.insert(0, "/root/reference")
    from taiyaki import layers as ref_layers
    lossvector = lossvector + ref_layers.flipflop_logpartition(
        outputs) / nblk
    loss = lossvector.mean()
    loss.backward()
    grads = {name: p.grad.detach().numpy().copy()
             for name, p in net.named_parameters()
             if p.grad is not None}
    return float(loss), grads


def jax_grads(ckpt, batch, sharpen):
    """Loss + grad pytree from this framework on the same batch."""
    import jax
    itc = sys.modules["itc"]
    from taiyaki_tpu import layers as tpu_layers  # noqa: F401
    from taiyaki_tpu import train

    ref_net = itc.tolerant_torch_load(ckpt, "/root/reference")
    src, params = itc.convert_layer(ref_net)
    namespace = {}
    exec("from taiyaki_tpu import layers, activation\n"
         "net = " + src, namespace)
    net = namespace["net"]
    loss_fn = jax.jit(train.make_loss_fn(net))
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, sharpen)
    return float(loss), jax.tree.map(np.asarray, grads)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("checkpoint", help="reference torch checkpoint")
    p.add_argument("input", help="mapped-signal HDF5")
    p.add_argument("--chunk_len", type=int, default=2000)
    p.add_argument("--sub_batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--sharpen", type=float, default=1.0)
    args = p.parse_args()

    np.random.seed(args.seed)
    from taiyaki_tpu.data import chunk_selection, mapped_signal_files
    from taiyaki_tpu import train

    with mapped_signal_files.MappedSignalReader(args.input) as msr:
        alphabet_info = msr.get_alphabet_information()
        read_data = list(msr.reads(None))
    filter_params = chunk_selection.sample_filter_parameters(
        read_data, 1000, args.chunk_len, 3.0, 10.0, 0.5, 5, 1.1)
    batch, _rej = train.sample_batch(
        read_data, args.chunk_len, args.sub_batch_size,
        train.max_seqlen_for_chunk(args.chunk_len, 5, 1.1),
        alphabet_info, filter_params)

    t_loss, t_grads = torch_grads(args.checkpoint, batch, args.sharpen)
    j_loss, j_grads = jax_grads(args.checkpoint, batch, args.sharpen)
    print("loss: torch=%.6f jax=%.6f  rel=%.2e" % (
        t_loss, j_loss, abs(t_loss - j_loss) / max(abs(t_loss), 1e-12)))

    # map each torch parameter name onto its converted-pytree path (the
    # converter stores tensors verbatim, so grads map 1:1)
    j_by_path = dict(_flatten_with_path(j_grads))
    print("%-44s %-30s %10s %10s" % ("torch", "jax", "relmax", "cosine"))
    worst = 0.0
    for t_name, t_g in t_grads.items():
        j_path = _torch_name_to_path(t_name)
        assert j_path in j_by_path, (t_name, j_path, list(j_by_path))
        j_g = j_by_path[j_path]
        assert t_g.shape == j_g.shape, (t_name, t_g.shape, j_path, j_g.shape)
        denom = max(float(np.abs(t_g).max()), 1e-12)
        relmax = float(np.abs(t_g - j_g).max()) / denom
        cos = float((t_g * j_g).sum() /
                    (np.linalg.norm(t_g) * np.linalg.norm(j_g) + 1e-30))
        worst = max(worst, relmax)
        print("%-44s %-30s %10.2e %10.6f" % (t_name, j_path, relmax, cos))
    print("worst relmax: %.3e" % worst)


def _torch_name_to_path(name):
    """sublayers.1.layer.cudnn_gru.weight_ih_l0 -> /sublayers[1]/layer/iW"""
    parts = name.split(".")
    leaf = parts[-1]
    leaf = {"weight_ih_l0": "iW", "weight_hh_l0": "sW",
            "bias_ih_l0": "b", "bias_hh_l0": "b_hh",
            "weight": "W", "bias": "b"}[leaf]
    out = ""
    for p in parts[:-1]:
        if p in ("cudnn_gru", "lstm", "conv", "linear", "pad"):
            continue
        out += "[" + p + "]" if p.isdigit() else "/" + p
    return out + "/" + leaf


def _flatten_with_path(tree, prefix=""):
    """Depth-first (key-ordered for dicts, index-ordered for lists) flatten
    matching the converter's layer order == torch named_parameters order."""
    out = []
    if isinstance(tree, dict):
        # converter emits {"sublayers": [...]} / {"W":..,"b":..}; keep
        # insertion order (python dicts preserve it)
        for k, v in tree.items():
            out += _flatten_with_path(v, prefix + "/" + str(k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out += _flatten_with_path(v, prefix + "[" + str(i) + "]")
    elif tree is None:
        pass
    else:
        arr = np.asarray(tree)
        out.append((prefix, arr))
    return out


if __name__ == "__main__":
    main()
