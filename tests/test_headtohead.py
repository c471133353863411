"""Tests for the reference head-to-head analysis harness
(misc/ref_headtohead/): trajectory statistics, torch-name -> pytree-path
mapping, and the trainer's validation-holdout semantics (the behavior
whose absence in the reference — bin/train_flipflop.py:506-509 there —
the head-to-head root-caused; see docs/training_parity.md)."""

import importlib.util
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H2H = os.path.join(REPO, "misc", "ref_headtohead")


def _load(name, filename):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(H2H, filename))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_run(d, losses, val=None):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "batch.log"), "w") as f:
        f.write("iter\tloss\tgradientmax\tgradientcap\tlearning_rate\t"
                "chunk_len\n")
        for i, x in enumerate(losses):
            f.write("%d\t%r\tNA\tNA\t0.001\t2000\n" % (i + 1, float(x)))
    if val is not None:
        with open(os.path.join(d, "validation.log"), "w") as f:
            f.write("iter\tloss\n")
            for it, x in val:
                f.write("%d\t%r\n" % (it, x))


def test_compare_smoothing_and_parity(tmp_path):
    cmp_mod = _load("h2h_compare", "compare.py")
    # trailing moving average with shorter prefixes
    sm = cmp_mod.smooth(np.array([1.0, 2.0, 3.0, 4.0]), 2)
    assert np.allclose(sm, [1.0, 1.5, 2.5, 3.5])
    # two identical-distribution groups -> PARITY OK end-to-end
    rng = np.random.default_rng(0)
    dirs = {}
    for name in ("ref_a", "ref_b", "tpu_a", "tpu_b"):
        d = str(tmp_path / name)
        _write_run(d, 1.0 / np.arange(1, 201) + rng.normal(0, 0.01, 200),
                   val=[(100, 0.5), (200, 0.4)])
        dirs[name] = d
    out = subprocess.run(
        [sys.executable, os.path.join(H2H, "compare.py"),
         "--ref", dirs["ref_a"], dirs["ref_b"],
         "--tpu", dirs["tpu_a"], dirs["tpu_b"],
         "--at", "100", "200", "--tail_from", "50"],
        capture_output=True, text=True, check=True)
    assert "PARITY: OK" in out.stdout
    assert "0.4000" in out.stdout  # final_val column parsed


def test_grad_parity_name_mapping():
    gp = _load("h2h_grad_parity", "grad_parity.py")
    cases = {
        "sublayers.0.conv.weight": "/sublayers[0]/W",
        "sublayers.1.layer.cudnn_gru.weight_ih_l0":
            "/sublayers[1]/layer/iW",
        "sublayers.2.cudnn_gru.weight_hh_l0": "/sublayers[2]/sW",
        "sublayers.2.cudnn_gru.bias_ih_l0": "/sublayers[2]/b",
        "sublayers.6.linear.bias": "/sublayers[6]/b",
    }
    for name, path in cases.items():
        assert gp._torch_name_to_path(name) == path
    # flatten mirrors the converter's {dict,list} nesting
    tree = {"sublayers": [{"W": np.zeros(2), "b": np.zeros(1)},
                          {"layer": {"iW": np.zeros(3)}}]}
    paths = [p for p, _ in gp._flatten_with_path(tree)]
    assert paths == ["/sublayers[0]/W", "/sublayers[0]/b",
                     "/sublayers[1]/layer/iW"]


def test_trainer_holds_out_reporting_reads(tmp_path):
    """The trainer must EXCLUDE --reporting_strand_list reads from
    training (the reference logs this but does not do it).  Pinned via
    a 2-iteration run on the 2-read fixture: with one read held out the
    trainer must log training on exactly 1 read, and with
    --include_reporting_strands it must not hold any out."""
    import h5py
    import pytest
    fixture = os.path.join(
        "/root/reference/test/data/mapped_signal_file",
        "mapped_reads_0.hdf5")
    if not os.path.exists(fixture):
        pytest.skip("reference fixture data not present")
    with h5py.File(fixture, "r") as f:
        read_ids = list(f["Reads"].keys())
    assert len(read_ids) == 2
    strands = tmp_path / "val.tsv"
    strands.write_text("read_id\n%s\n" % read_ids[0])

    def run(extra, outdir):
        cmd = [sys.executable, os.path.join(REPO, "bin",
                                            "train_flipflop.py"),
               "--size", "16", "--stride", "5", "--winlen", "19",
               "--seed", "1", "--chunk_len_min", "1000",
               "--chunk_len_max", "1000", "--min_sub_batch_size", "2",
               "--niteration", "2", "--warmup_batches", "1",
               "--save_every", "2", "--reporting_sub_batches", "1",
               "--reporting_strand_list", str(strands),
               "--device", "cpu",
               "--outdir", str(outdir), "--overwrite"] + extra + [
               os.path.join(REPO, "taiyaki_tpu", "models",
                            "mGru_flipflop.py"), fixture]
        subprocess.run(cmd, check=True, capture_output=True, text=True,
                       timeout=900)
        return (outdir / "model.log").read_text()

    log = run([], tmp_path / "holdout")
    assert "Holding out 1 reads for validation, training on 1." in log
    log_inc = run(["--include_reporting_strands"], tmp_path / "inc")
    assert "Holding out" not in log_inc
