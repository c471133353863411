"""Smoke tests for the remaining misc/ and squiggle bin/ scripts as
subprocesses (reference's acceptance tier covers the same surfaces via
workflow shells; these run under plain pytest)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_MSF = ("/root/reference/test/data/mapped_signal_file/"
               "mapped_reads_0.hdf5")
STRAND_LIST = "/root/reference/test/data/strand_lists/strand_list.txt"
TORCH_CKPT = ("/root/reference/models/"
              "mGru_flipflop_remapping_model_r9_DNA.checkpoint")
CONVERTED = os.path.join(REPO, "taiyaki_tpu", "models",
                         "mGru_flipflop_remapping_model_r9_DNA.checkpoint")

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(FIXTURE_MSF), reason="reference fixtures absent")


def run(args, timeout=600, cwd=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=env, timeout=timeout, cwd=cwd)


@needs_fixtures
def test_split_strandlist(tmp_path):
    r = run([os.path.join(REPO, "misc", "split_strandlist.py"),
             "--nparts", "2", "--prefix", str(tmp_path / "part"),
             STRAND_LIST])
    assert r.returncode == 0, r.stderr[-1000:]
    parts = sorted(p for p in os.listdir(tmp_path))
    assert len(parts) == 2
    total = 0
    for p in parts:
        lines = open(str(tmp_path / p)).read().splitlines()
        assert lines[0].split("\t")[0] == "filename"
        total += len(lines) - 1
    assert total == len(open(STRAND_LIST).read().splitlines()) - 1


@needs_fixtures
def test_check_hdf5_contents():
    r = run([os.path.join(REPO, "misc", "check_hdf5_contents.py"),
             FIXTURE_MSF])
    assert r.returncode == 0, r.stderr[-1000:]
    assert "Reads" in r.stdout or "alphabet" in r.stdout


@needs_fixtures
def test_inspect_mapped_signal_alphabet():
    r = run([os.path.join(REPO, "misc",
                          "convert_alphabet_or_inspect_mapped_signal_file"
                          ".py"), FIXTURE_MSF, "--print_only"])
    assert r.returncode == 0, r.stderr[-1000:]
    assert "ACGT" in r.stdout + r.stderr


@needs_fixtures
def test_plot_mapped_signals(tmp_path):
    out = str(tmp_path / "mapped.png")
    r = run([os.path.join(REPO, "misc", "plot_mapped_signals.py"),
             "--output", out, "--nreads", "2", "--quiet", FIXTURE_MSF])
    assert r.returncode == 0, r.stderr[-1000:]
    assert os.path.getsize(out) > 0


def test_motif(tmp_path):
    refs = tmp_path / "refs.fa"
    refs.write_text(">r1\nACGTACGTACGTAAAA\n>r2\nTTTTACGTACGTACGT\n")
    coords = tmp_path / "coords.tsv"
    coords.write_text("filename\tpos\nr1\t4\nr2\t8\n")
    r = run([os.path.join(REPO, "misc", "motif.py"), str(refs),
             str(coords)])
    assert r.returncode == 0, r.stderr[-1000:]
    assert r.stdout.strip()


@pytest.mark.skipif(not os.path.exists(TORCH_CKPT),
                    reason="reference torch checkpoint absent")
def test_import_torch_checkpoint_matches_pinned(tmp_path):
    """Importing the shipped torch remapping model reproduces the pinned
    converted checkpoint's parameters exactly."""
    out = str(tmp_path / "imported.checkpoint")
    r = run([os.path.join(REPO, "misc", "import_torch_checkpoint.py"),
             TORCH_CKPT, out])
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out, "rb") as fh:
        got = pickle.load(fh)
    with open(CONVERTED, "rb") as fh:
        expected = pickle.load(fh)

    import jax
    g_leaves = jax.tree.leaves(got["params"])
    e_leaves = jax.tree.leaves(expected["params"])
    assert len(g_leaves) == len(e_leaves)
    for g, e in zip(g_leaves, e_leaves):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))


def test_upgrade_model(tmp_path):
    with open(CONVERTED, "rb") as fh:
        ckpt = pickle.load(fh)
    ckpt["metadata"].pop("standardize", None)
    ckpt["metadata"]["version"] = 2
    old = str(tmp_path / "old.checkpoint")
    with open(old, "wb") as fh:
        pickle.dump(ckpt, fh)
    out = str(tmp_path / "new.checkpoint")
    r = run([os.path.join(REPO, "misc", "upgrade_model.py"), old, out])
    assert r.returncode == 0, r.stderr[-1000:]
    with open(out, "rb") as fh:
        upgraded = pickle.load(fh)
    assert upgraded["metadata"]["version"] == 3
    assert upgraded["metadata"]["standardize"] is True
    # torch pickles are routed to the importer with a helpful message
    r = run([os.path.join(REPO, "misc", "upgrade_model.py"),
             TORCH_CKPT, str(tmp_path / "nope.checkpoint")])
    assert r.returncode != 0
    assert "import_torch_checkpoint" in r.stderr


@needs_fixtures
def test_get_refs_from_sam(tmp_path):
    import glob as globmod
    sams = sorted(globmod.glob(
        "/root/reference/test/data/aligner_output/*.sam"))
    out = str(tmp_path / "refs.fa")
    r = run([os.path.join(REPO, "bin", "get_refs_from_sam.py"),
             "--output", out,
             "/root/reference/test/data/genomic_reference.fasta"] + sams)
    assert r.returncode == 0, r.stderr[-2000:]
    text = open(out).read()
    names = [line[1:].split()[0] for line in text.splitlines()
             if line.startswith(">")]
    assert len(names) >= 3
    # the fixture per-read references were built the same way
    expected = {"db6b45aa-5d21-45cf-a435-05fb8f12e839",
                "0f776a08-1101-41d4-8097-89136494a46e",
                "de1508c4-755b-489e-9ffb-51af35c9a7e6"}
    assert expected.issubset(set(names))


@needs_fixtures
def test_prepare_mapped_reads_acceptance(tmp_path):
    """Mirror of the reference's test_prepare_remap: remap the 5 fixture
    reads against their per-read references, assert the output file
    passes its own integrity check and chunk mean dwell is physical
    (reference test/acceptance/test_prepare_remap.py:40-120)."""
    out = str(tmp_path / "mapped.hdf5")
    r = run([os.path.join(REPO, "bin", "prepare_mapped_reads.py"),
             "--jobs", "2",
             "/root/reference/test/data/reads",
             "/root/reference/test/data/readparams.tsv", out, CONVERTED,
             "/root/reference/test/data/per_read_references.fasta"],
            timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    sys.path.insert(0, REPO)
    from taiyaki_tpu.data.mapped_signal_files import MappedSignalReader
    with MappedSignalReader(out) as msr:
        assert msr.check() == "pass"
        read_ids = msr.get_read_ids()
        # 3 of the 5 fixture reads have per-read references
        assert len(read_ids) == 3
        read = msr.get_read(sorted(read_ids)[0])
        # chunk from the middle of the mapped region: start-of-read
        # stall sections have legitimately huge dwells
        d_start, d_end = read.get_mapped_dacs_region()
        mid = (d_end - d_start - 1000) // 2
        chunk = read.get_chunk_with_sample_length(1000, start_sample=mid)
        assert chunk.accepted
        assert 5.0 < chunk.mean_dwell < 20.0


@needs_fixtures
def test_prepare_mapped_reads_batched_matches_perread(tmp_path):
    """The accelerator remap path (batched, length-bucketed forwards —
    the default when --device is not cpu) must produce the same mappings
    as the multiprocess per-read path (--device cpu)."""
    import numpy as np
    outs = {}
    for tag, dev in [("batched", []), ("perread", ["--device", "cpu"])]:
        out = str(tmp_path / ("mapped_%s.hdf5" % tag))
        r = run([os.path.join(REPO, "bin", "prepare_mapped_reads.py"),
                 "--jobs", "2"] + dev + [
                 "/root/reference/test/data/reads",
                 "/root/reference/test/data/readparams.tsv", out, CONVERTED,
                 "/root/reference/test/data/per_read_references.fasta"],
                timeout=900)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = out

    sys.path.insert(0, REPO)
    from taiyaki_tpu.data.mapped_signal_files import MappedSignalReader
    with MappedSignalReader(outs["batched"]) as a, \
            MappedSignalReader(outs["perread"]) as b:
        ids_a, ids_b = sorted(a.get_read_ids()), sorted(b.get_read_ids())
        assert ids_a == ids_b and len(ids_a) == 3
        for rid in ids_a:
            ra, rb = a.get_read(rid), b.get_read(rid)
            np.testing.assert_array_equal(ra.Dacs, rb.Dacs)
            np.testing.assert_array_equal(ra.Reference, rb.Reference)
            # batch-8 and batch-1 forwards round differently (XLA tiles
            # by shape), so near-tie Viterbi boundaries can shift — by
            # several blocks where the scores plateau (signal stalls).
            # The mapping must still be the same alignment in substance:
            # almost every boundary identical, shifts bounded.
            r2s_a, r2s_b = ra.Ref_to_signal, rb.Ref_to_signal
            assert r2s_a.shape == r2s_b.shape
            moved = np.abs(r2s_a - r2s_b)
            assert (moved > 0).mean() < 0.01, (moved > 0).mean()
            assert moved.max() <= 32, moved.max()  # <= 16 blocks


@needs_fixtures
def test_plot_accuracy_histogram(tmp_path):
    out = str(tmp_path / "acc")
    r = run([os.path.join(REPO, "misc",
                          "plot_accuracy_histogram_from_alignment_summary"
                          ".py"),
             "/root/reference/test/data/aligner_output/"
             "alignment_summary.txt", "--output_name", out])
    assert r.returncode == 0, r.stderr[-1000:]
    assert any(f.startswith("acc") for f in os.listdir(tmp_path))


@needs_fixtures
def test_squiggle_train_predict_map(tmp_path):
    """train_squiggle -> predict_squiggle -> map_to_squiggle end to end."""
    outdir = str(tmp_path / "squiggle")
    r = run([os.path.join(REPO, "bin", "train_squiggle.py"),
             "--device", "cpu", "--size", "8", "--depth", "2",
             "--winlen", "5", "--target_len", "100", "--batch_size", "6",
             "--niteration", "2", "--save_every", "2", "--seed", "4",
             "--sample_nreads_before_filtering", "20",
             "--outdir", outdir, FIXTURE_MSF], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    model = os.path.join(outdir, "model_final.checkpoint")
    assert os.path.exists(model)

    fasta = tmp_path / "in.fa"
    fasta.write_text(">seq1\nACGTACGTGGCATTACGGA\n")
    r = run([os.path.join(REPO, "bin", "predict_squiggle.py"),
             model, str(fasta)])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    # header + one row per base
    assert lines[0].split("\t")[0] == "base"
    assert len(lines) == 1 + len("ACGTACGTGGCATTACGGA")

    reads_dir = "/root/reference/test/data/reads"
    refs = "/root/reference/test/data/per_read_references.fasta"
    r = run([os.path.join(REPO, "bin", "map_to_squiggle.py"),
             "--limit", "1", model, refs, reads_dir], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip()

    # plot the squiggle prediction TSV
    tsv = tmp_path / "pred.tsv"
    r = run([os.path.join(REPO, "bin", "predict_squiggle.py"),
             model, str(fasta)])
    tsv.write_text(r.stdout)
    png = str(tmp_path / "pred.png")
    r = run([os.path.join(REPO, "misc", "plot_predict_squiggle_output.py"),
             str(tsv), png])
    assert r.returncode == 0, r.stderr[-1000:]
    assert os.path.getsize(png) > 0
