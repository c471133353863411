"""Unit tests for host-side utilities: iterators, fileio, helpers
(checkpoint round trip, smoother, progress, md5)."""

import os

import numpy as np
import pytest

from taiyaki_tpu import iterators
from taiyaki_tpu.utils import fileio, helpers


def _square(x):
    return x * x


def _addmul(x, add, mul=1):
    return (x + add) * mul


def test_imap_mp_serial():
    assert list(iterators.imap_mp(_square, range(5))) == [0, 1, 4, 9, 16]


def test_imap_mp_fix_args_kwargs():
    out = list(iterators.imap_mp(_addmul, range(3), fix_args=[10],
                                 fix_kwargs={"mul": 2}))
    assert out == [20, 22, 24]


def test_imap_mp_parallel():
    out = sorted(iterators.imap_mp(_square, range(8), threads=2,
                                   unordered=True))
    assert out == [x * x for x in range(8)]


def test_try_except_pass():
    assert iterators.try_except_pass(int, "nope") is None
    assert iterators.try_except_pass(int, "7") == 7


def test_readtsv(tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\tb\n1\t2.5\n3\t4.5\n")
    t = fileio.readtsv(str(p), fields=["a", "b"])
    np.testing.assert_array_equal(t["a"], [1, 3])
    np.testing.assert_allclose(t["b"], [2.5, 4.5])
    with pytest.raises(KeyError):
        fileio.readtsv(str(p), fields=["missing"])


def test_readtsv_single_row(tmp_path):
    p = tmp_path / "one.tsv"
    p.write_text("x\ty\n5\t6\n")
    t = fileio.readtsv(str(p))
    assert len(np.atleast_1d(t)) == 1
    assert t["x"][0] == 5


def test_checkpoint_roundtrip(tmp_path):
    from taiyaki_tpu.models import mGru_flipflop
    rng = np.random.default_rng(0)
    net = mGru_flipflop.network(size=8, winlen=5, stride=2)
    params = net.init(rng)
    source = open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "taiyaki_tpu", "models", "mGru_flipflop.py")).read()
    metadata = {"reverse": False, "standardize": True, "version": 3}
    path = helpers.save_model(
        str(tmp_path), net, params, source,
        {"size": 8, "winlen": 5, "stride": 2, "insize": 1}, metadata,
        index=7)
    assert path.endswith("model_checkpoint_00007.checkpoint")
    net2, params2, _, meta2, kwargs2, _ = helpers.load_model(path)
    assert meta2["version"] == 3
    assert kwargs2["size"] == 8
    x = rng.normal(size=(40, 1, 1)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(net.apply(params, x)),
                               np.asarray(net2.apply(params2, x)),
                               rtol=1e-6)


def test_checkpoint_metadata_mismatch_warns(tmp_path):
    from taiyaki_tpu.models import mGru_flipflop
    rng = np.random.default_rng(0)
    net = mGru_flipflop.network(size=8, winlen=5, stride=2)
    params = net.init(rng)
    path = helpers.save_model(
        str(tmp_path), net, params, "def network(**k):\n    pass\n", {},
        {"reverse": False, "standardize": True, "version": 3})
    with pytest.warns(RuntimeWarning):
        helpers.load_model(path, model_metadata={"reverse": True})


def test_windowed_exp_smoother():
    sm = helpers.WindowedExpSmoother(alpha=0.5, n_vals=4)
    assert np.isnan(sm.value)
    sm.update(1.0)
    assert sm.value == 1.0
    sm.update(3.0)
    # weights [1, .5] over [3, 1] -> (3 + .5)/1.5
    assert abs(sm.value - (3.0 + 0.5) / 1.5) < 1e-9


def test_file_md5(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello world")
    assert helpers.file_md5(str(p)) == "5eb63bbbe01eeed093cb22bb8f5acdc3"


def test_progress_counts(capsys):
    prog = helpers.Progress(quiet=True)
    for _ in range(5):
        prog.step()
    assert prog.count == 5


def test_readtsv_fields_with_spaces(tmp_path):
    """Tab delimiting (the reference's) must survive spaces inside a
    field — fast5 filenames in strand lists can contain them."""
    p = tmp_path / "sl.tsv"
    p.write_text("filename_fast5\tread_id\nrun 1_read.fast5\tabc-123\n")
    t = fileio.readtsv(str(p), fields=["filename_fast5", "read_id"])
    assert t["filename_fast5"][0] == "run 1_read.fast5"
    assert t["read_id"][0] == "abc-123"


def test_empty_iterator_preserves_elements():
    is_empty, it = iterators.empty_iterator(iter([1, 2, 3]))
    assert not is_empty
    assert list(it) == [1, 2, 3]
    is_empty, it = iterators.empty_iterator(iter([]))
    assert is_empty


def test_read_chunks_yields_line_iterators(tmp_path):
    p = tmp_path / "big.tsv"
    field = "x" * 80  # longer than any fixed-width dtype would keep
    p.write_text("h1\th2\n" + "".join(
        "{}\t{}\n".format(field, i) for i in range(5)))
    chunks = list(fileio.read_chunks(str(p), 2))
    lines = [line for chunk in chunks for line in chunk]
    assert len(lines) == 6  # header + 5 rows
    assert field in lines[1]


def test_iter_fasta_empty_records(tmp_path):
    from taiyaki_tpu import bio
    p = tmp_path / "refs.fa"
    p.write_text(">a\nACGT\n>empty\n>b\nGG\n>\nTT\n")
    with open(p) as fh:
        records = dict(bio.iter_fasta(fh))
    assert records == {"a": "ACGT", "empty": "", "b": "GG", "": "TT"}


def test_open_file_or_stdout_does_not_close_stdout(capsys):
    import sys
    with helpers.open_file_or_stdout(None) as fh:
        fh.write("hello\n")
    assert not sys.stdout.closed
    print("still alive")  # must not raise
    assert "still alive" in capsys.readouterr().out
