#!/usr/bin/env python3
"""On-chip A/B harness for trace-time train-step variants.

Benches several env-flag variants of the full train step IN ONE PROCESS
(one backend init, one warm tunnel): the variant flags are read at trace
time (ops/rnn.py), so flipping os.environ between jit instantiations
yields distinct compiled programs.  Each (variant, batch) cell runs
`--repeats` timing windows of `--iters` chained steps with a scalar
host-fetch barrier, reporting the best (the axon tunnel has a ±1.5%
run-to-run band; see docs/performance.md "measurement honesty").

Usage:
    python misc/ab_train_variants.py --batches 128,256,512 \
        --variants default,norecompute [--model mGru] [--shape rna]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT_ENVS = {
    "default": {},
    "bt4": {"TAIYAKI_TPU_RNN_BLOCK_T": "4"},
    "stepwgrad": {"TAIYAKI_TPU_STEP_WGRAD": "1"},
    "faketrans": {"TAIYAKI_TPU_FAKE_TRANS": "1"},
    "noacts": {"TAIYAKI_TPU_ACTS_BWD": "0"},
    "bb128bt4": {"TAIYAKI_TPU_RNN_BLOCK_B": "128",
                 "TAIYAKI_TPU_RNN_BLOCK_T": "4"},
    "bb128bt8": {"TAIYAKI_TPU_RNN_BLOCK_B": "128",
                 "TAIYAKI_TPU_RNN_BLOCK_T": "8"},
    "bb64bt8": {"TAIYAKI_TPU_RNN_BLOCK_B": "64",
                "TAIYAKI_TPU_RNN_BLOCK_T": "8"},
    "bt8": {"TAIYAKI_TPU_RNN_BLOCK_T": "8"},
    "norecompute": {"TAIYAKI_TPU_NO_RECOMPUTE": "1"},
    "f32acts": {"TAIYAKI_TPU_BF16_ACTS": "0"},
    "f32grads": {"TAIYAKI_TPU_F32_GRADS": "1"},
    "noscorefuse": {"TAIYAKI_TPU_NO_SCORE_FUSE": "1"},
    "nocrffuse": {"TAIYAKI_TPU_NO_SCORE_FUSE": "1"},
}


def make_batch(train, rng, chunk_len, stride, batch_size):
    import jax.numpy as jnp
    from taiyaki_tpu.flipflopfings import flipflop_code
    max_seqlen = train.max_seqlen_for_chunk(chunk_len, stride, 1.1)
    signal = rng.normal(size=(chunk_len, batch_size, 1)).astype(np.float32)
    seqlens = np.minimum(
        rng.integers(chunk_len // 12, chunk_len // 8, size=batch_size),
        max_seqlen).astype(np.int32)
    max_seqlen = train.bucket_seqlen(int(seqlens.max()), max_seqlen)
    seqs = np.zeros((batch_size, max_seqlen), dtype=np.int32)
    for i in range(batch_size):
        labels = rng.integers(0, 4, size=seqlens[i])
        seqs[i, :seqlens[i]] = flipflop_code(labels)
    return train.Batch(jnp.asarray(signal), jnp.asarray(seqs),
                       jnp.asarray(seqlens), None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="256")
    ap.add_argument("--variants", default="default,norecompute")
    ap.add_argument("--model", default="mLstm")
    ap.add_argument("--shape", default="dna")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from taiyaki_tpu import train

    rna = args.shape == "rna"
    chunk_len = int(os.environ.get("BENCH_CHUNK", 16000 if rna else 4000))
    stride = int(os.environ.get("BENCH_STRIDE", 10 if rna else 5))
    winlen = int(os.environ.get("BENCH_WINLEN", 31 if rna else 19))
    if args.model == "mGru":
        from taiyaki_tpu.models import mGru_flipflop as model_mod
        if "BENCH_STRIDE" not in os.environ and not rna:
            stride = 2
    else:
        from taiyaki_tpu.models import mLstm_flipflop as model_mod

    rng = np.random.default_rng(0)
    net = model_mod.network(size=args.size, stride=stride, winlen=winlen)
    opt, _ = train.make_optimizer(lr_max=4e-3, niteration=1000,
                                  warmup_batches=10, lr_warmup=1e-4,
                                  lr_min=1e-4)
    results = {}
    for bs in [int(b) for b in args.batches.split(",")]:
        batch = make_batch(train, np.random.default_rng(0), chunk_len,
                           stride, bs)
        for variant in args.variants.split(","):
            env = VARIANT_ENVS[variant]
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                # a variant that fails to compile (e.g. a VMEM OOM at a
                # probed block size) is a data point, not a fatal error
                params = net.init(np.random.default_rng(0))
                opt_state = opt.init(params)
                nleaves = len(jax.tree.leaves(params))
                threshs = jnp.full(nleaves, jnp.inf, jnp.float32)
                # fresh jit instance -> re-trace under this env
                step = train.jit_train_step(
                    train.make_train_step(net, opt), mesh=None)
                t0 = time.perf_counter()
                params, opt_state, loss, _ = step(
                    params, opt_state, batch, 1.0, 1.0, threshs)
                warm_loss = float(loss)
                compile_s = time.perf_counter() - t0
                best = 0.0
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        params, opt_state, loss, _ = step(
                            params, opt_state, batch, 1.0, 1.0, threshs)
                    final = float(loss)
                    dt = time.perf_counter() - t0
                    best = max(best, args.iters * bs / dt)
                results[(bs, variant)] = (best, final)
                print(json.dumps({
                    "bs": bs, "variant": variant,
                    "chunks_per_sec": round(best, 1),
                    "first_loss": round(warm_loss, 6),
                    "final_loss": round(final, 6),
                    "compile_s": round(compile_s, 1),
                }), flush=True)
            except Exception as exc:
                print(json.dumps({
                    "bs": bs, "variant": variant,
                    "error": "%s: %s" % (type(exc).__name__,
                                         str(exc)[-300:]),
                }), flush=True)
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
    # pairwise summary per batch (failed variants simply absent)
    for bs in sorted({k[0] for k in results}):
        row = {v: results[(bs, v)][0] for b, v in results if b == bs}
        print("# bs=%d  %s" % (bs, "  ".join(
            "%s=%.0f" % (v, r) for v, r in row.items())), flush=True)


if __name__ == "__main__":
    main()
