#!/usr/bin/env python3
"""End-to-end serving benchmark: bin/basecall.py wall-clock on
realistic-length reads.

The tracked BENCH_METRIC=basecall number measures only the device chain
(forward + make_trans + Viterbi); the tiny 5-read fixture set makes the
CLI end-to-end number host-IO-dominated and unrepresentative.  This
script synthesizes a read set at REALISTIC nanopore scale (default 100
reads x 100k samples, ~2.5 kb/read at dwell ~10 and stride-equivalent
calling) into a multi-read fast5, then times the full CLI — fasta,
fastq, beam, beam+fastq — reporting per-variant wall-clock and
derived ksample/s, plus the CLI's own stage telemetry.

Methodology (r4): the axon-tunnel link has a documented 3-6x wall-clock
variance between sessions, so per-variant "best observed" numbers from
different windows are not comparable (the r3 table had fasta slower
than fastq for exactly this reason).  This script therefore runs all
variants INTERLEAVED for --rounds rounds (one full variant cycle per
round, same read set), discards a warmup round (first-process XLA
compiles; a shared persistent compile cache serves the rest), and
reports per-variant MEDIANS with the min-max spread.  fasta <= fastq <=
beam within noise is the expected ordering; a violation means the
window was bad, not the code.

Usage: python misc/serve_bench.py [--nreads 100] [--samples 100000]
           [--variants fasta,fastq,beam,beam_fastq] [--model PATH]
           [--rounds 5]
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

import h5py
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_MODEL = os.path.join(
    REPO, "taiyaki_tpu", "models",
    "mGru_flipflop_remapping_model_r9_DNA.checkpoint")

VARIANTS = {
    "fasta": [],
    "fastq": ["--fastq"],
    "beam": ["--beam", "5", "1"],           # --beam takes (width, guided)
    "beam_fastq": ["--beam", "5", "1", "--fastq"],
}


def synth_fast5(path, nreads, nsamples, seed=0):
    """Multi-read fast5 of square-wave-ish synthetic signal (levels per
    random base, Poisson dwells ~10 samples/base — the remap fixtures'
    generative model, tests/test_train.py:synth_reads)."""
    rng = np.random.default_rng(seed)
    levels = np.array([-1.0, -0.3, 0.4, 1.1])
    with h5py.File(path, "w") as f5:
        for i in range(nreads):
            rid = "synth-%05d" % i
            nbases = max(10, int(nsamples / 10))
            dwells = np.maximum(2, rng.poisson(10, size=nbases))
            bases = rng.integers(0, 4, size=nbases)
            sig = np.repeat(levels[bases], dwells)[:nsamples]
            if sig.size < nsamples:
                sig = np.pad(sig, (0, nsamples - sig.size), mode="edge")
            sig = sig + rng.normal(0, 0.15, size=sig.size)
            dacs = np.clip(sig * 1000, -32000, 32000).astype(np.int16)
            grp = f5.create_group("read_" + rid)
            ch = grp.create_group("channel_id")
            ch.attrs["digitisation"] = 8192.0
            ch.attrs["offset"] = 0.0
            ch.attrs["range"] = 8192.0
            ch.attrs["sampling_rate"] = 4000.0
            raw = grp.create_group("Raw")
            raw.attrs["read_id"] = rid
            raw.attrs["start_time"] = 0
            raw.attrs["duration"] = int(dacs.size)
            raw.create_dataset("Signal", data=dacs, dtype="i2")


def run_variant(variant, reads_dir, tmp, model, device, env, tag=""):
    """One CLI invocation; returns (wall_seconds, nbases) or None."""
    out = os.path.join(tmp, "calls_%s%s.%s" % (
        variant, tag, "fastq" if "fastq" in variant else "fa"))
    if os.path.exists(out):
        os.unlink(out)          # basecall.py refuses to overwrite
    cmd = [sys.executable, os.path.join(REPO, "bin", "basecall.py"),
           "--output", out, "--jobs", str(os.cpu_count() or 1)
           ] + VARIANTS[variant]
    if device:
        cmd += ["--device", device]
    cmd += [reads_dir, model]
    t0 = time.perf_counter()
    res = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=7200, env=env)
    dt = time.perf_counter() - t0
    if res.returncode != 0:
        print("%s FAILED rc=%d\n%s" % (variant, res.returncode,
                                       res.stderr[-2000:]), flush=True)
        return None
    nbases = 0
    with open(out) as fh:
        for j, line in enumerate(fh):
            if "fastq" in variant:
                if j % 4 == 1:
                    nbases += len(line.strip())
            elif not line.startswith(">"):
                nbases += len(line.strip())
    return dt, nbases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nreads", type=int, default=100)
    ap.add_argument("--samples", type=int, default=100_000)
    ap.add_argument("--variants", default="fasta,fastq,beam,beam_fastq")
    ap.add_argument("--model", default=DEFAULT_MODEL)
    ap.add_argument("--device", default=None,
                    help="forwarded to basecall.py --device")
    ap.add_argument("--rounds", type=int, default=5,
                    help="matched interleaved rounds (median reported); "
                         "one extra warmup round runs first and is "
                         "discarded")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="servebench_")
    reads_dir = os.path.join(tmp, "reads")
    os.makedirs(reads_dir)
    print("# synthesizing %d reads x %d samples -> %s" %
          (args.nreads, args.samples, reads_dir), flush=True)
    synth_fast5(os.path.join(reads_dir, "reads.fast5"),
                args.nreads, args.samples)

    # shared persistent compile cache: after the warmup round every
    # invocation reuses the compiled programs, so the medians measure
    # serving, not XLA compiles.  The cache lives in the REPO (same dir
    # the test suite uses), not the bench tmp dir: the remote compile
    # service has been observed to take 10-30 MINUTES per program in bad
    # windows, so compile warmth must survive across bench sessions.
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.environ.get(
                   "JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache")),
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")

    variants = args.variants.split(",")
    total_samples = args.nreads * args.samples
    walls = {v: [] for v in variants}
    bases = {v: 0 for v in variants}
    for rnd in range(args.rounds + 1):
        tag = "warmup" if rnd == 0 else "round %d/%d" % (rnd, args.rounds)
        for variant in variants:
            r = run_variant(variant, reads_dir, tmp, args.model,
                            args.device, env)
            # (same path each round: run_variant unlinks before running)
            if r is None:
                continue
            dt, nb = r
            print("# %-10s %-11s %7.1f s" % (tag, variant, dt),
                  flush=True)
            if rnd > 0:
                walls[variant].append(dt)
                bases[variant] = nb

    print("\n== medians over %d matched interleaved rounds "
          "(warmup discarded) ==" % args.rounds)
    for variant in variants:
        w = sorted(walls[variant])
        if not w:
            continue
        med = w[len(w) // 2] if len(w) % 2 else 0.5 * (
            w[len(w) // 2 - 1] + w[len(w) // 2])
        print("%-11s median=%7.1fs  (min %.1f  max %.1f)  "
              "%8.1f ksample/s  %7.1f kbase/s" %
              (variant, med, w[0], w[-1], total_samples / med / 1e3,
               bases[variant] / med / 1e3), flush=True)
    if not args.keep:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        print("# kept:", tmp)


if __name__ == "__main__":
    main()
