"""Data-layer tests: SignalMapping integrity/chunking, HDF5 v8 round-trips
in both layouts, and — crucially — reading the reference's own fixture
files, which pins byte-level format compatibility."""

import glob
import os

import numpy as np
import pytest

from taiyaki_tpu.alphabet import AlphabetInfo
from taiyaki_tpu.data import chunk_selection, mapped_signal_files
from taiyaki_tpu.data.signal import Signal
from taiyaki_tpu.data.signal_mapping import Chunk, SignalMapping

REF_FIXTURES = sorted(glob.glob(
    "/root/reference/test/data/mapped_signal_file/*.hdf5"))


def make_read(rng, read_id="read-0", siglen=2000, mean_dwell=10):
    """Synthetic read: random walk signal with a uniform-ish mapping."""
    nbases = siglen // mean_dwell
    dacs = np.cumsum(rng.integers(-8, 9, size=siglen)).astype(np.int16)
    reference = rng.integers(0, 4, size=nbases).astype(np.int16)
    # Random monotone mapping across most of the signal.
    starts = np.sort(rng.choice(np.arange(10, siglen - 10), size=nbases,
                                replace=False)).astype(np.int32)
    ref_to_sig = np.concatenate([starts, [starts[-1] + 5]]).astype(np.int32)
    return SignalMapping(
        ref_to_sig, reference, read_id=read_id, Dacs=dacs,
        shift_frompA=100.0, scale_frompA=15.0, range=1500.0, offset=10.0,
        digitisation=8192.0)


@pytest.fixture
def reads():
    rng = np.random.default_rng(100)
    return [make_read(rng, "read-{}".format(i)) for i in range(5)]


def test_signal_mapping_check_passes(reads):
    for read in reads:
        assert read.check() == "pass"


def test_signal_mapping_check_catches_bad_length(reads):
    bad = reads[0]
    bad.Ref_to_signal = bad.Ref_to_signal[:-2]
    assert "1 + length" in bad.check()


def test_get_reftosignal_inversion():
    # sig->ref: 10 samples over 4 bases with head/tail unmapped
    sig_to_ref = np.array([-1, -1, 0, 0, 1, 1, 1, 2, -1, -1])
    rts = SignalMapping.get_reftosignal(sig_to_ref, 5, 10)
    assert len(rts) == 6
    assert rts[0] == 2       # base 0 starts at first mapped sample
    assert rts[1] == 4
    assert rts[2] == 7
    assert rts[3] == 8       # end of last mapped base (7 + 1)
    assert rts[4] == 11 and rts[5] == 11  # unmapped tail = siglen + 1


def test_get_reftosignal_all_clipped():
    rts = SignalMapping.get_reftosignal(np.full(10, -1), 4, 10)
    np.testing.assert_array_equal(rts, -np.ones(5))


def test_from_remapping_path_stride2():
    sig = Signal(dacs=np.arange(20, dtype=np.int16), read_id="r")
    # downsampled sigtoref over 8 positions, stride 2
    sigtoref = np.array([0, 0, 1, 1, 2, 2, 3, 3], dtype=np.int32)
    reference = np.array([0, 1, 2, 3], dtype=np.int16)
    sm = SignalMapping.from_remapping_path(sigtoref, reference, 2, sig)
    assert sm.check() == "pass"
    assert len(sm.Ref_to_signal) == 5


def test_chunk_extraction_and_current(reads):
    read = reads[0]
    chunk = read.get_chunk_with_sample_length(500, start_sample=10)
    assert chunk.accepted
    assert chunk.sig_len == 500
    assert chunk.seq_len > 0
    # standardization: (pA - shift)/scale
    d0, _ = read.get_mapped_dacs_region()
    region = (d0 + 10, d0 + 510)
    pa = (read.Dacs[region[0]:region[1]] + 10.0) * 1500.0 / 8192.0
    np.testing.assert_allclose(chunk.current, (pa - 100.0) / 15.0, rtol=1e-6)


def test_chunk_sequence_length_mode(reads):
    chunk = reads[0].get_chunk_with_sequence_length(50, start_base=3)
    assert chunk.accepted
    assert chunk.seq_len == 50


def test_chunk_too_short_rejection(reads):
    chunk = reads[0].get_chunk_with_sample_length(10**6)
    assert chunk.reject_reason == Chunk.rej_str_short


def test_filters():
    fp = chunk_selection.FILTER_PARAMETERS(
        filter_mean_dwell=3.0, filter_max_dwell=5.0,
        filter_min_pass_fraction=0.5, median_meandwell=10.0,
        mad_meandwell=1.0, model_stride=5, path_buffer=1.1)
    good = Chunk("r", np.zeros(1000), np.zeros(100), max_dwell=20,
                 start_sample=0)
    good.apply_filters(fp)
    assert good.accepted
    # mean dwell 100 vs median 10 -> meandwell reject
    bad = Chunk("r", np.zeros(1000), np.zeros(10), max_dwell=20,
                start_sample=0)
    bad.apply_filters(fp)
    assert bad.reject_reason == Chunk.rej_str_mean_dwl
    # path buffer: sig_len/(seq_len*stride) <= 1.1
    tight = Chunk("r", np.zeros(550), np.zeros(100), max_dwell=8,
                  start_sample=0)
    tight.apply_filters(fp)
    assert tight.reject_reason == Chunk.rej_str_path_buffer
    # max dwell
    spiky = Chunk("r", np.zeros(1000), np.zeros(100), max_dwell=100,
                  start_sample=0)
    spiky.apply_filters(fp)
    assert spiky.reject_reason == Chunk.rej_str_max_dwl


def test_sample_chunks(reads):
    fp = chunk_selection.FILTER_PARAMETERS(
        filter_mean_dwell=10.0, filter_max_dwell=50.0,
        filter_min_pass_fraction=0.1, median_meandwell=10.0,
        mad_meandwell=5.0, model_stride=2, path_buffer=1.1)
    np.random.seed(3)
    chunks, reasons = chunk_selection.sample_chunks(reads, 8, 300, fp)
    assert len(chunks) == 8
    assert sum(reasons.values()) >= 8


def test_sample_filter_parameters(reads):
    np.random.seed(4)
    fp = chunk_selection.sample_filter_parameters(
        reads, 20, 300, filter_mean_dwell=10.0, filter_max_dwell=50.0,
        filter_min_pass_fraction=0.1, model_stride=2, path_buffer=1.1)
    assert fp.median_meandwell is not None
    assert 5 < fp.median_meandwell < 20  # synthetic mean dwell ~10


@pytest.mark.parametrize("batch_format", [False, True])
def test_hdf5_roundtrip(tmp_path, reads, batch_format):
    path = str(tmp_path / "rt.hdf5")
    ai = AlphabetInfo("ACGT", "ACGT")
    with mapped_signal_files.HDF5Writer(path, ai, batch_format) as w:
        for read in reads:
            w.write_read(read.get_read_dictionary())
    with mapped_signal_files.HDF5Reader(path) as r:
        assert r.version == 8
        assert sorted(r.get_read_ids()) == sorted(
            rd.read_id for rd in reads)
        assert r.check() == "pass"
        back = {rd.read_id: rd for rd in r.reads()}
        ai2 = r.get_alphabet_information()
    assert ai2.equals(ai)
    for read in reads:
        got = back[read.read_id]
        np.testing.assert_array_equal(got.Dacs, read.Dacs)
        np.testing.assert_array_equal(got.Ref_to_signal, read.Ref_to_signal)
        np.testing.assert_array_equal(got.Reference, read.Reference)
        assert got.shift_frompA == read.shift_frompA
        assert got.scale_frompA == read.scale_frompA


def test_hdf5_some_reads(tmp_path, reads):
    path = str(tmp_path / "some.hdf5")
    ai = AlphabetInfo("ACGT", "ACGT")
    with mapped_signal_files.HDF5Writer(path, ai, True) as w:
        for read in reads:
            w.write_read(read.get_read_dictionary())
    with mapped_signal_files.HDF5Reader(path) as r:
        wanted = [reads[0].read_id, reads[2].read_id]
        got = sorted(rd.read_id for rd in r.reads(wanted))
    assert got == sorted(wanted)


@pytest.mark.skipif(not REF_FIXTURES, reason="reference fixtures not present")
@pytest.mark.parametrize("path", REF_FIXTURES,
                         ids=[os.path.basename(p) for p in REF_FIXTURES])
def test_read_reference_fixture_files(path):
    """Format compatibility: files written by the reference load here."""
    with mapped_signal_files.HDF5Reader(path) as r:
        assert r.version == 8
        read_ids = r.get_read_ids()
        assert len(read_ids) > 0
        nread = 0
        for read in r.reads():
            assert read.check() == "pass"
            nread += 1
        assert nread == len(read_ids)
        ai = r.get_alphabet_information()
        assert ai.ncan_base == 4
