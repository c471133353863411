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


def test_modified_base_output(tmp_path):
    """--modified_base_output writes per-called-base mod scores whose row
    count matches the basecall length (regression: the mod stream was
    read one block late; flipflopfings.path_mod_scores pins the
    alignment, this pins the CLI path end-to-end)."""
    import importlib.util
    import h5py
    import numpy as np
    spec = importlib.util.spec_from_file_location(
        "tcm", os.path.join(REPO, "tests", "test_pallas_mesh_catmod.py"))
    tcm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tcm)
    from taiyaki_tpu.alphabet import AlphabetInfo
    from taiyaki_tpu.data import mapped_signal_files as msf

    rng = np.random.default_rng(11)
    reads = tcm.synth_mod_reads(rng, nreads=4, nbases=300)
    ai = AlphabetInfo("ACGTZ", "ACGTA", mod_long_names=["5mZ"])
    mapped = str(tmp_path / "mod.hdf5")
    with msf.MappedSignalWriter(mapped, ai) as w:
        for r in reads:
            w.write_read(r.get_read_dictionary())

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    run = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "train_flipflop.py"),
         "--size", "16", "--stride", "2", "--winlen", "9", "--seed", "1",
         "--chunk_len_min", "600", "--chunk_len_max", "600",
         "--min_sub_batch_size", "4", "--niteration", "2",
         "--warmup_batches", "1", "--save_every", "2",
         "--reporting_sub_batches", "1", "--outdir", run, "--overwrite",
         os.path.join(REPO, "taiyaki_tpu", "models",
                      "mGru_cat_mod_flipflop.py"), mapped],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    # one read's raw signal as a fast5
    reads_dir = tmp_path / "reads"
    reads_dir.mkdir()
    with h5py.File(str(reads_dir / "r.fast5"), "w") as f5:
        grp = f5.create_group("read_" + reads[0].read_id)
        ch = grp.create_group("channel_id")
        for k, v in (("digitisation", 1.0), ("offset", 0.0),
                     ("range", 1.0), ("sampling_rate", 4000.0)):
            ch.attrs[k] = v
        raw = grp.create_group("Raw")
        raw.attrs["read_id"] = reads[0].read_id
        raw.attrs["start_time"] = 0
        raw.attrs["duration"] = int(reads[0].Dacs.size)
        raw.create_dataset("Signal", data=reads[0].Dacs, dtype="i2")

    calls = str(tmp_path / "calls.fa")
    mods_h5 = str(tmp_path / "mods.hdf5")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "basecall.py"),
         "--device", "cpu", "--output", calls,
         "--modified_base_output", mods_h5, "--quiet",
         str(reads_dir), os.path.join(run, "model_final.checkpoint")],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    fasta = load_fasta(calls)
    assert reads[0].read_id in fasta
    with h5py.File(mods_h5, "r") as f:
        assert list(f["mod_long_names"][()].astype(str)) == ["5mZ"]
        scores = f["Reads"][reads[0].read_id][()]
    # one row per called base, one column per mod
    assert scores.shape == (len(fasta[reads[0].read_id]), 1)
    assert np.isfinite(scores).any() or np.isnan(scores).all()
