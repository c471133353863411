"""Acceptance test: bin/basecall.py reproduces the reference decode chain.

tests/data/reference_parity_calls.fa was produced by running the reference
implementation's exact math path (torch model forward -> autograd
make_trans -> pure-torch Viterbi -> stitch -> path_to_str) on the 5 fixture
reads with the shipped remapping model; this was verified bit-identical to
this framework's basecall.py output at creation time.  The test pins that
parity by re-running our CLI as a subprocess.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
READS_DIR = "/root/reference/test/data/reads"
MODEL = os.path.join(REPO, "taiyaki_tpu", "models",
                     "mGru_flipflop_remapping_model_r9_DNA.checkpoint")
EXPECTED = os.path.join(REPO, "tests", "data", "reference_parity_calls.fa")


def load_fasta(path):
    out = {}
    with open(path) as fh:
        for line in fh:
            if line.startswith(">"):
                rid = line[1:].strip()
            else:
                out[rid] = line.strip()
    return out


@pytest.mark.skipif(not os.path.isdir(READS_DIR),
                    reason="reference fixtures not present")
def test_basecall_sharded_matches_single_device(tmp_path):
    """Multi-device basecalling (chunk batch sharded over a ('data',)
    mesh — the SPMD replacement for the reference's one-model-per-GPU
    worker pool) must be bit-identical to single-device calling."""
    outs = {}
    for tag, ndev_args in [("one", ["--ndevices", "1"]), ("all", [])]:
        out = str(tmp_path / ("calls_%s.fa" % tag))
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        result = subprocess.run(
            [sys.executable, os.path.join(REPO, "bin", "basecall.py"),
             "--device", "cpu", "--output", out,
             "--max_concurrent_chunks", "8", "--quiet"]
            + ndev_args + [READS_DIR, MODEL],
            capture_output=True, text=True, env=env, timeout=900)
        assert result.returncode == 0, result.stderr[-2000:]
        if tag == "all":
            assert "Sharding chunk batches over 8 devices" in result.stderr
        outs[tag] = load_fasta(out)
    assert outs["one"] == outs["all"]


@pytest.mark.skipif(not os.path.isdir(READS_DIR),
                    reason="reference fixtures not present")
def test_basecall_cli_matches_reference_chain(tmp_path):
    out = str(tmp_path / "calls.fa")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "basecall.py"),
         "--device", "cpu", "--output", out, "--max_concurrent_chunks", "8",
         "--quiet", READS_DIR, MODEL],
        capture_output=True, text=True, env=env, timeout=900)
    assert result.returncode == 0, result.stderr[-2000:]
    got = load_fasta(out)
    expected = load_fasta(EXPECTED)
    assert set(got) == set(expected)
    for rid in expected:
        assert got[rid] == expected[rid], (
            "basecall for {} diverged from reference".format(rid))
    assert "5 reads" in result.stderr or "Called 5" in result.stderr


@pytest.mark.skipif(not os.path.isdir(READS_DIR),
                    reason="reference fixtures not present")
def test_beam_fastq_emits_quality_strings(tmp_path):
    """--fastq with --beam must emit real fastq records whose quality
    string length equals the basecall length (the beam sequence is
    aligned back to the blocks for per-base error probs).  The
    reference's own beam+fastq path is a latent NameError
    (bin/basecall.py:215-229) — this exceeds it."""
    out = str(tmp_path / "calls.fastq")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "basecall.py"),
         "--device", "cpu", "--output", out, "--max_concurrent_chunks", "8",
         "--fastq", "--beam", "5", "True", "--quiet",
         READS_DIR, MODEL],
        capture_output=True, text=True, env=env, timeout=900)
    assert result.returncode == 0, result.stderr[-2000:]
    lines = open(out).read().splitlines()
    assert len(lines) % 4 == 0 and len(lines) >= 4 * 5
    for i in range(0, len(lines), 4):
        assert lines[i].startswith("@")
        assert lines[i + 2] == "+"
        seq, qual = lines[i + 1], lines[i + 3]
        assert len(seq) == len(qual) > 0
        assert all(33 <= ord(c) < 127 for c in qual)
    # q-scores must match the Viterbi path's error-prob scale (this
    # model emits ~uniform low q on the fixtures pre-calibration —
    # misc/calibrate_qscores_byread.py is the reference's answer); a
    # broken branch would emit '!' (errprob 1 / the -1 fill)
    quals = "".join(lines[i + 3] for i in range(0, len(lines), 4))
    assert "!" not in quals
    out_v = str(tmp_path / "calls_vit.fastq")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "basecall.py"),
         "--device", "cpu", "--output", out_v,
         "--max_concurrent_chunks", "8", "--fastq", "--quiet",
         READS_DIR, MODEL],
        capture_output=True, text=True, env=env, timeout=900)
    assert result.returncode == 0, result.stderr[-2000:]
    vlines = open(out_v).read().splitlines()
    vquals = "".join(vlines[i + 3] for i in range(0, len(vlines), 4))
    mean_q = lambda qs: sum(ord(c) - 33 for c in qs) / len(qs)
    assert abs(mean_q(quals) - mean_q(vquals)) < 3.0
