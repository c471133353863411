"""Acceptance tests running bin/ and misc/ scripts as subprocesses against
fixture data (mirrors the reference's test/acceptance tier)."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL = os.path.join(REPO, "taiyaki_tpu", "models",
                     "mGru_flipflop_remapping_model_r9_DNA.checkpoint")
FIXTURE_MSF = ("/root/reference/test/data/mapped_signal_file/"
               "mapped_reads_0.hdf5")

have_fixtures = os.path.exists(FIXTURE_MSF)
needs_fixtures = pytest.mark.skipif(not have_fixtures,
                                    reason="reference fixtures absent")


def run(args, timeout=600, cwd=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=env, timeout=timeout, cwd=cwd)


def test_dump_json_roundtrip(tmp_path):
    json_path = str(tmp_path / "model.json")
    r = run([os.path.join(REPO, "bin", "dump_json.py"), MODEL,
             "--output", json_path])
    assert r.returncode == 0, r.stderr[-1000:]
    with open(json_path) as fh:
        j = json.load(fh)
    assert j["type"] == "serial"
    assert "md5sum" in j
    ckpt_path = str(tmp_path / "back.checkpoint")
    r = run([os.path.join(REPO, "misc", "json_to_checkpoint.py"),
             json_path, "--output", ckpt_path])
    assert r.returncode == 0, r.stderr[-1000:]
    with open(ckpt_path, "rb") as fh:
        ckpt = pickle.load(fh)
    assert ckpt["metadata"]["version"] == 3


@needs_fixtures
def test_merge_mappedsignalfiles(tmp_path):
    out = str(tmp_path / "merged.hdf5")
    r = run([os.path.join(REPO, "misc", "merge_mappedsignalfiles.py"), out,
             "--input", FIXTURE_MSF, "None",
             "--input",
             FIXTURE_MSF.replace("reads_0", "reads_1"), "1",
             "--seed", "3", "--batch_format"])
    assert r.returncode == 0, r.stderr[-1000:]
    from taiyaki_tpu.data.mapped_signal_files import MappedSignalReader
    with MappedSignalReader(out) as msr:
        assert len(msr.get_read_ids()) == 3  # 2 + 1
        assert msr.check() == "pass"


@needs_fixtures
def test_check_mapped_signal_file():
    r = run([os.path.join(REPO, "misc", "check_mapped_signal_file.py"),
             FIXTURE_MSF])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "pass" in r.stdout


@needs_fixtures
def test_train_flipflop_smoke(tmp_path):
    outdir = str(tmp_path / "train")
    r = run([os.path.join(REPO, "bin", "train_flipflop.py"),
             "--device", "cpu", "--size", "16", "--stride", "2",
             "--winlen", "9", "--niteration", "3", "--warmup_batches", "1",
             "--chunk_len_min", "300", "--chunk_len_max", "400",
             "--min_sub_batch_size", "4", "--save_every", "2",
             "--sample_nreads_before_filtering", "50",
             "--reporting_sub_batches", "10", "--seed", "5",
             "--outdir", outdir,
             os.path.join(REPO, "taiyaki_tpu", "models", "mGru_flipflop.py"),
             FIXTURE_MSF],
            timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(outdir, "model_final.checkpoint"))
    batch_log = open(os.path.join(outdir, "batch.log")).read().splitlines()
    assert len(batch_log) == 4  # header + 3 iterations


def test_train_resume_from_checkpoint(tmp_path):
    """Resuming = passing a .checkpoint as the model arg; optimizer state
    travels with it (reference resumes weights only, helpers.py:98-105)."""
    common = ["--device", "cpu", "--size", "16", "--stride", "2",
              "--winlen", "9", "--niteration", "2", "--warmup_batches", "1",
              "--chunk_len_min", "300", "--chunk_len_max", "400",
              "--min_sub_batch_size", "4", "--save_every", "2",
              "--sample_nreads_before_filtering", "50",
              "--reporting_sub_batches", "10", "--seed", "11"]
    first = str(tmp_path / "first")
    r = run([os.path.join(REPO, "bin", "train_flipflop.py")] + common
            + ["--outdir", first,
               os.path.join(REPO, "taiyaki_tpu", "models",
                            "mGru_flipflop.py"), FIXTURE_MSF], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(first, "model_final.checkpoint")
    with open(ckpt, "rb") as fh:
        assert pickle.load(fh)["optimizer_state"] is not None
    second = str(tmp_path / "second")
    r = run([os.path.join(REPO, "bin", "train_flipflop.py")] + common
            + ["--outdir", second, ckpt, FIXTURE_MSF], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    losses1 = [float(line.split("\t")[1]) for line in
               open(os.path.join(first, "batch.log")).read().splitlines()[1:]]
    losses2 = [float(line.split("\t")[1]) for line in
               open(os.path.join(second,
                                 "batch.log")).read().splitlines()[1:]]
    # Resumed training carries on from the trained model, not from scratch.
    assert losses2[0] < losses1[0]


def test_reverse_rna_train_and_basecall(tmp_path):
    """RNA mode: --reverse trains on 3'->5' signal, stamps the
    checkpoint metadata, and basecall honours both the model metadata
    (signal reversal) and its own --reverse flag (output reversal)."""
    outdir = str(tmp_path / "rna")
    r = run([os.path.join(REPO, "bin", "train_flipflop.py"),
             "--device", "cpu", "--size", "16", "--stride", "2",
             "--winlen", "9", "--niteration", "2", "--warmup_batches", "1",
             "--chunk_len_min", "300", "--chunk_len_max", "400",
             "--min_sub_batch_size", "4", "--save_every", "2",
             "--sample_nreads_before_filtering", "50",
             "--reporting_sub_batches", "10", "--seed", "8", "--reverse",
             "--outdir", outdir,
             os.path.join(REPO, "taiyaki_tpu", "models",
                          "mGru_flipflop.py"), FIXTURE_MSF], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(outdir, "model_final.checkpoint")
    with open(ckpt, "rb") as fh:
        assert pickle.load(fh)["metadata"]["reverse"] is True

    out_fwd = str(tmp_path / "fwd.fa")
    out_rev = str(tmp_path / "rev.fa")
    reads = "/root/reference/test/data/reads"
    for out, extra in ((out_fwd, []), (out_rev, ["--reverse"])):
        r = run([os.path.join(REPO, "bin", "basecall.py"),
                 "--device", "cpu", "--output", out, "--quiet"] + extra
                + [reads, ckpt], timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
    fwd = [line for line in open(out_fwd) if not line.startswith(">")]
    rev = [line for line in open(out_rev) if not line.startswith(">")]
    assert len(fwd) == len(rev) == 5
    for f, v in zip(fwd, rev):
        assert f.strip() == v.strip()[::-1]


def test_train_abinitio_smoke(tmp_path):
    """Bootstrap trainer on a synthesized chunks HDF5 + indexed fasta
    (reference: bin/train_abinitio.py on /chunks + per-index refs)."""
    import h5py
    rng = np.random.default_rng(0)
    nchunk, chunk_len = 20, 400
    chunks_path = str(tmp_path / "chunks.hdf5")
    with h5py.File(chunks_path, "w") as f:
        f.create_dataset(
            "chunks", data=rng.normal(size=(nchunk, chunk_len)
                                      ).astype(np.float32))
    fasta = tmp_path / "refs.fa"
    with open(fasta, "w") as fh:
        for i in range(nchunk):
            seq = "".join(rng.choice(list("ACGT"), size=40))
            fh.write(">{}\n{}\n".format(i, seq))
    outdir = str(tmp_path / "abinitio")
    r = run([os.path.join(REPO, "bin", "train_abinitio.py"),
             "--device", "cpu", "--size", "16", "--stride", "2",
             "--winlen", "9", "--niteration", "2", "--batch_size", "4",
             "--save_every", "2", "--seed", "2", "--outdir", outdir,
             os.path.join(REPO, "taiyaki_tpu", "models",
                          "mGru_flipflop.py"),
             chunks_path, str(fasta)], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(outdir, "model_final.checkpoint"))
    # references are cached as a pickle for future runs
    assert os.path.exists(str(tmp_path / "refs.pkl"))


@needs_fixtures
def test_misc_diagnostics_smoke(tmp_path):
    """plot_training / assess_alignment / calibrate_qscores on real
    fixtures (reference: misc/ diagnostics tier)."""
    # a real training log from the smoke run above would race; make one
    outdir = str(tmp_path / "train")
    r = run([os.path.join(REPO, "bin", "train_flipflop.py"),
             "--device", "cpu", "--size", "16", "--stride", "2",
             "--winlen", "9", "--niteration", "3", "--warmup_batches", "1",
             "--chunk_len_min", "300", "--chunk_len_max", "400",
             "--min_sub_batch_size", "4", "--save_every", "2",
             "--sample_nreads_before_filtering", "50",
             "--reporting_sub_batches", "10", "--seed", "6",
             "--outdir", outdir,
             os.path.join(REPO, "taiyaki_tpu", "models",
                          "mGru_flipflop.py"), FIXTURE_MSF], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    png = str(tmp_path / "training.png")
    r = run([os.path.join(REPO, "misc", "plot_training.py"), png, outdir])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(png) > 0

    aln_dir = "/root/reference/test/data/aligner_output"
    import glob as globmod
    sams = sorted(globmod.glob(os.path.join(aln_dir, "*.sam")))
    r = run([os.path.join(REPO, "misc", "assess_alignment.py"),
             "--data_name", "fixture", "--no-output_plot"] + sams,
            cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "fixture" in r.stdout

    # calibrate wants fastqs + alignment_summary.txt in one directory
    calib_dir = tmp_path / "calib_in"
    calib_dir.mkdir()
    fq_dir = "/root/reference/test/data/basecaller_output"
    for f in os.listdir(fq_dir):
        if f.endswith(".fastq"):
            os.symlink(os.path.join(fq_dir, f), str(calib_dir / f))
    os.symlink(os.path.join(aln_dir, "alignment_summary.txt"),
               str(calib_dir / "alignment_summary.txt"))
    plot = str(tmp_path / "qcal.png")
    r = run([os.path.join(REPO, "misc", "calibrate_qscores_byread.py"),
             "--input_directory", str(calib_dir),
             "--plot_filename", plot])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "shift" in r.stdout or "scale" in r.stdout


def test_upgrade_mapped_signal_v7(tmp_path):
    """Synthesize a v7 file (per-read alphabet attrs) and upgrade it."""
    import h5py
    v7 = str(tmp_path / "v7.hdf5")
    with h5py.File(v7, "w") as f:
        f.attrs["version"] = 7
        g = f.create_group("Reads/read-1")
        g.attrs["alphabet"] = "ACGT"
        g.attrs["collapse_alphabet"] = "ACGT"
        g.attrs["read_id"] = "read-1"
        g.attrs["shift_frompA"] = 0.0
        g.attrs["scale_frompA"] = 1.0
        g.attrs["range"] = 1.0
        g.attrs["offset"] = 0.0
        g.attrs["digitisation"] = 1.0
        g.create_dataset("Dacs", data=np.zeros(30, dtype=np.int16))
        g.create_dataset("Ref_to_signal",
                         data=np.arange(0, 33, 8, dtype=np.int32))
        g.create_dataset("Reference", data=np.zeros(4, dtype=np.int16))
    out = str(tmp_path / "v8.hdf5")
    r = run([os.path.join(REPO, "misc", "upgrade_mapped_signal.py"),
             v7, out])
    assert r.returncode == 0, r.stderr[-1000:]
    from taiyaki_tpu.data.mapped_signal_files import MappedSignalReader
    with MappedSignalReader(out) as msr:
        assert msr.version == 8
        ai = msr.get_alphabet_information()
        assert ai.alphabet == "ACGT"
        reads = list(msr.reads())
        assert len(reads) == 1
