#!/usr/bin/env python3
"""Benchmark: flip-flop training throughput on one chip.

Measures chunks/sec for a full jitted training step (forward + CRF loss +
logZ + backward + AdamW update) of the production-shape mLstm flip-flop
model (size 256, stride 5, winlen 19) at chunk_len 4000, the middle of the
reference's 3000-8000 production range.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference implementation's measured
single-device step throughput recorded in BASELINE.json (if present);
otherwise null — taiyaki publishes no official numbers (BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_PROBE = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((128, 128)); "
    "assert float((x @ x).sum()) == 128.0 * 128 * 128"
)


def probe_backend(attempts=8, timeout_s=150):
    """Check the JAX backend can initialize and run a tiny matmul.

    Runs in a subprocess so a failed (and process-cached) backend init
    does not poison this process; retries with backoff because the
    remote-TPU tunnel can be transiently wedged (BENCH_r01.json was a
    single unretried init failure).  Returns None on success, else the
    last failure description.
    """
    last = None
    for i in range(attempts):
        try:
            res = subprocess.run(
                [sys.executable, "-c", _PROBE], capture_output=True,
                text=True, timeout=timeout_s)
            if res.returncode == 0:
                return None
            last = (res.stderr or res.stdout).strip().splitlines()[-1:]
            last = last[0] if last else "probe exited rc=%d" % res.returncode
        except subprocess.TimeoutExpired:
            last = "probe timed out after %ds" % timeout_s
        if i + 1 < attempts:
            # the tunnel's wedges can last tens of minutes (r3 observed
            # ~30 min); with 8 attempts this waits ~15 min total before
            # giving up, which has recovered every observed wedge
            time.sleep(min(180, 15 * (i + 1)))
    return last


def emit_error(message):
    """Emit the single JSON line in error form so the driver can tell a
    wedged backend apart from a broken build (rc stays 0 deliberately)."""
    metric = {"basecall": ("basecall_ksample_per_sec", "ksample/s"),
              "serve": ("serve_ksample_per_sec", "ksample/s")}.get(
        os.environ.get("BENCH_METRIC", ""),
        ("train_chunks_per_sec", "chunks/s"))
    print(json.dumps({
        "metric": metric[0],
        "value": None,
        "unit": metric[1],
        "vs_baseline": None,
        "error": message,
    }))


def main_serve():
    """Third tracked metric (BENCH_METRIC=serve): END-TO-END CLI serving
    — bin/basecall.py wall-clock over a synthetic realistic-length read
    set (fast5 in -> fasta out, host chunking/stitching included),
    median of 3 runs after a discarded warmup (shared compile cache).
    BENCH_SERVE_NREADS / BENCH_SERVE_SAMPLES size the read set."""
    import statistics
    import tempfile

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "misc"))
    import serve_bench

    nreads = int(os.environ.get("BENCH_SERVE_NREADS", "25"))
    nsamples = int(os.environ.get("BENCH_SERVE_SAMPLES", "100000"))
    import shutil
    tmp = tempfile.mkdtemp(prefix="benchserve_")
    try:
        reads_dir = os.path.join(tmp, "reads")
        os.makedirs(reads_dir)
        serve_bench.synth_fast5(os.path.join(reads_dir, "reads.fast5"),
                                nreads, nsamples)
        # persistent cache (see misc/serve_bench.py: remote compiles can
        # take tens of minutes; warmth must survive across sessions)
        env = dict(os.environ,
                   JAX_COMPILATION_CACHE_DIR=os.environ.get(
                       "JAX_COMPILATION_CACHE_DIR",
                       os.path.join(
                           os.path.dirname(os.path.abspath(__file__)),
                           ".jax_cache")),
                   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
                   JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
        walls = []
        for rnd in range(4):            # warmup + 3 measured
            r = serve_bench.run_variant(
                "fasta", reads_dir, tmp, serve_bench.DEFAULT_MODEL, None,
                env)
            if r is None:
                emit_error("basecall.py failed (see serve_bench output)")
                return
            if rnd > 0:
                walls.append(r[0])
        med = statistics.median(walls)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({
        "metric": "serve_ksample_per_sec",
        "value": round(nreads * nsamples / med / 1e3, 1),
        "unit": "ksample/s (CLI fast5->fasta, %d reads x %dk samples, "
                "median of 3 warm runs)" % (nreads, nsamples // 1000),
        "vs_baseline": None,
    }))


def main_basecall():
    """Second tracked metric (BENCH_METRIC=basecall): device-side
    basecall chain — model forward -> posterior transitions
    (make_trans) -> Viterbi best path — in ksample/s on the production
    mLstm shape.  Host-side chunking/stitching/fasta IO are excluded
    (they overlap device compute through the chunk queue in
    bin/basecall.py)."""
    import jax
    import jax.numpy as jnp
    from taiyaki_tpu.ops import decode as dec

    rna = os.environ.get("BENCH_SHAPE", "dna").lower() == "rna"
    chunk_len = int(os.environ.get("BENCH_CHUNK", "16000" if rna
                                   else "4000"))
    stride = int(os.environ.get("BENCH_STRIDE", "10" if rna else "5"))
    winlen = int(os.environ.get("BENCH_WINLEN", "31" if rna else "19"))
    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    size = int(os.environ.get("BENCH_SIZE", "256"))
    model = os.environ.get("BENCH_MODEL", "mLstm")
    if model == "mGru":
        from taiyaki_tpu.models import mGru_flipflop as model_mod
        if "BENCH_STRIDE" not in os.environ and not rna:
            stride = 2
    else:
        from taiyaki_tpu.models import mLstm_flipflop as model_mod
    rng = np.random.default_rng(0)
    net = model_mod.network(size=size, stride=stride, winlen=winlen)
    params = jax.device_put(net.init(rng))
    x = jnp.asarray(rng.normal(
        size=(chunk_len, batch_size, 1)).astype(np.float32))

    @jax.jit
    def chain(params, x):
        trans = dec.flipflop_make_trans(net.apply(params, x))
        path = dec.flipflop_viterbi(
            jnp.log(jnp.maximum(trans, 1e-30)))[2]
        return path.sum()

    float(chain(params, x))  # compile + reliable barrier (see main())
    best = None
    for _ in range(3):
        niter = 20
        t0 = time.perf_counter()
        for _ in range(niter):
            r = chain(params, x)
        float(r)
        dt = time.perf_counter() - t0
        best = max(best or 0.0, niter * batch_size * chunk_len / dt)
    print(json.dumps({
        "metric": "basecall_ksample_per_sec",
        "value": round(best / 1e3, 1),
        "unit": "ksample/s ({}{} s{} chunk{} bs{}, fwd+make_trans+"
                "viterbi)".format(model, size, stride, chunk_len,
                                  batch_size),
        "vs_baseline": None,
    }))


def main():
    import jax
    import jax.numpy as jnp
    from taiyaki_tpu import train

    # Production shapes (reference README "Standard model parameters"):
    #   DNA high-accuracy: chunk 3000-8000, size 256, stride 5, winlen 19
    #   RNA high-accuracy: chunk 10000-20000, size 256, stride 10, winlen 31
    # Defaults bench the DNA shape at chunk 4000; BENCH_SHAPE=rna
    # switches every geometry default to the RNA production config
    # (chunk 16000 -> T=1600 blocks, 2x the DNA sequential chain).
    rna = os.environ.get("BENCH_SHAPE", "dna").lower() == "rna"
    chunk_len = int(os.environ.get("BENCH_CHUNK", "16000" if rna
                                   else "4000"))
    stride = int(os.environ.get("BENCH_STRIDE", "10" if rna else "5"))
    winlen = int(os.environ.get("BENCH_WINLEN", "31" if rna else "19"))
    # bs256 measured best on the fused kernels (4832 vs 4696 at bs128 vs
    # 4014 at bs64; bs512 exceeds the GRU-bwd kernel's VMEM even at
    # block_t=1).  Override with BENCH_BATCH for scaling probes.
    batch_size = int(os.environ.get("BENCH_BATCH", "256"))
    # 256 is the Guppy production width; BENCH_SIZE=384 probes the
    # reference trainer's default width (bin/_bin_argparse.py size=384)
    size = int(os.environ.get("BENCH_SIZE", "256"))
    # BENCH_MODEL=mGru benches the reference's default remap
    # architecture (alternating-direction GRU stack, stride 2);
    # mLstm_cat_mod / mGru_cat_mod bench modified-base training (5mC
    # alphabet), the reference's second training config with its own
    # CRF kernel (c_cat_mod_flipflop.c) and fused-selector Pallas path.
    model = os.environ.get("BENCH_MODEL", "mLstm")
    cat_mod = model.endswith("_cat_mod")
    if model.startswith("mGru"):
        from taiyaki_tpu.models import (
            mGru_cat_mod_flipflop, mGru_flipflop)
        model_mod = mGru_cat_mod_flipflop if cat_mod else mGru_flipflop
        if "BENCH_STRIDE" not in os.environ and not rna:
            stride = 2      # mGru's reference default
    else:
        from taiyaki_tpu.models import (
            mLstm_cat_mod_flipflop, mLstm_flipflop)
        model_mod = mLstm_cat_mod_flipflop if cat_mod else mLstm_flipflop
    max_seqlen = train.max_seqlen_for_chunk(chunk_len, stride, 1.1)

    rng = np.random.default_rng(0)
    if cat_mod:
        from taiyaki_tpu.alphabet import AlphabetInfo
        ai = AlphabetInfo("ACGTZ", "ACGTC", ["5mC"], do_reorder=True)
        net = model_mod.network(size=size, stride=stride, winlen=winlen,
                                alphabet_info=ai)
        head = net.sublayers[-1]
        can_mods_offsets = head.can_mods_offsets
        can_labels, mod_labels = head.can_labels, head.mod_labels
        mod_cat_weights = np.ones(head.ncan_base + head.nmod_base,
                                  dtype=np.float32)
    else:
        net = model_mod.network(size=size, stride=stride, winlen=winlen)
        can_mods_offsets = can_labels = mod_labels = None
        mod_cat_weights = None
    params = net.init(rng)
    opt, _ = train.make_optimizer(
        lr_max=4e-3, niteration=1000, warmup_batches=10, lr_warmup=1e-4,
        lr_min=1e-4)
    opt_state = opt.init(params)
    step = train.jit_train_step(
        train.make_train_step(net, opt, cat_mod, can_mods_offsets,
                              mod_cat_weights), mesh=None)

    signal = rng.normal(size=(chunk_len, batch_size, 1)).astype(np.float32)
    # Realistic sequence lengths: ~chunk_len/10 bases (dwell ~10 samples).
    seqlens = np.minimum(
        rng.integers(chunk_len // 12, chunk_len // 8, size=batch_size),
        max_seqlen).astype(np.int32)
    # Pad sequences exactly as the trainer does: to the smallest 128-lane
    # bucket that fits the batch (train.bucket_seqlen), not to the
    # worst-case path-buffer bound.
    max_seqlen = train.bucket_seqlen(int(seqlens.max()), max_seqlen)
    seqs = np.zeros((batch_size, max_seqlen), dtype=np.int32)
    mod_cats = np.zeros((batch_size, max_seqlen), dtype=np.int32) \
        if cat_mod else None
    from taiyaki_tpu.flipflopfings import flipflop_code
    for i in range(batch_size):
        if cat_mod:
            # full-alphabet labels (ACGT + Z=5mC) mapped through the
            # head's canonical/mod tables, as the trainer does
            labels = rng.integers(0, 5, size=seqlens[i])
            mod_cats[i, :seqlens[i]] = mod_labels[labels]
            labels = can_labels[labels]
        else:
            labels = rng.integers(0, 4, size=seqlens[i])
        seqs[i, :seqlens[i]] = flipflop_code(labels)
    batch = train.Batch(jnp.asarray(signal), jnp.asarray(seqs),
                        jnp.asarray(seqlens),
                        None if mod_cats is None else jnp.asarray(mod_cats))
    nleaves = len(jax.tree.leaves(params))
    threshs = jnp.full(nleaves, jnp.inf, jnp.float32)

    # Warmup / compile.  The barrier after each measurement is a host
    # fetch of the final loss: it depends on every step in the chain, and
    # unlike block_until_ready it is reliable on remote-execution
    # runtimes (axon) where readiness can resolve before compute.
    params, opt_state, loss, _ = step(params, opt_state, batch, 1.0, 1.0,
                                      threshs)
    float(loss)

    best = None
    for _ in range(3):
        niter = 20
        t0 = time.perf_counter()
        for _ in range(niter):
            params, opt_state, loss, _ = step(params, opt_state, batch,
                                              1.0, 1.0, threshs)
        float(loss)
        dt = time.perf_counter() - t0
        rate = niter * batch_size / dt
        best = rate if best is None else max(best, rate)
    chunks_per_sec = best

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE.json")
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as fh:
                baseline = json.load(fh)
            base = baseline.get("train_chunks_per_sec")
            if base:
                vs_baseline = chunks_per_sec / float(base)
        except Exception:
            pass

    print(json.dumps({
        "metric": "train_chunks_per_sec",
        "value": round(chunks_per_sec, 3),
        "unit": "chunks/s ({}{} s{} chunk{} bs{}, full train "
                "step)".format(model, size, stride, chunk_len, batch_size),
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    err = probe_backend()
    if err is not None:
        emit_error("backend probe failed after retries: %s" % err)
        sys.exit(0)
    try:
        if os.environ.get("BENCH_METRIC") == "basecall":
            main_basecall()
        elif os.environ.get("BENCH_METRIC") == "serve":
            main_serve()
        else:
            main()
    except Exception as exc:  # emit structured JSON even on failure
        emit_error("%s: %s" % (type(exc).__name__, exc))
        sys.exit(0)
