"""Tests for the dataset-preparation subsystem: fast5 reading (pure h5py),
fasta/SAM parsing, per-read params, and the remap worker — driven against
the reference's fixture data where available."""

import os

import numpy as np
import pytest

from taiyaki_tpu import bio, sam
from taiyaki_tpu.data import fast5utils
from taiyaki_tpu.data.signal import Signal
from taiyaki_tpu.maths import med_mad

READS_DIR = "/root/reference/test/data/reads"
MULTIREAD_DIR = "/root/reference/test/data/multireads"
SAM_FILE = ("/root/reference/test/data/aligner_output/"
            "fastq_runid_9a076f39fd3254aeacc15a915c736105296275f3_0.sam")

have_fixtures = os.path.isdir(READS_DIR)
needs_fixtures = pytest.mark.skipif(not have_fixtures,
                                    reason="reference fixtures not present")


def test_complement_and_reverse_complement():
    assert bio.complement("ACGT") == "TGCA"
    assert bio.reverse_complement("ACGT") == "ACGT"
    assert bio.reverse_complement("AAC") == "GTT"
    assert bio.complement("acgtN-") == "tgcaN-"


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "t.fasta"
    p.write_text(">a desc\nACGT\nACGT\n>b\nGGGG\n>ambig\nACGTX\n")
    d = bio.fasta_file_to_dict(str(p), filter_ambig=True)
    assert d == {"a": "ACGTACGT", "b": "GGGG"}
    d2 = bio.fasta_file_to_dict(str(p), filter_ambig=False,
                                flatten_ambig=True)
    assert d2["ambig"] == "ACGTN"


def test_sam_cigar_parsing():
    cig = sam.parse_cigar("5S10M2I3D8M1S")
    a = sam.Alignment("q", 0, "r", 99, cig, None)
    assert a.query_length == 5 + 10 + 2 + 8 + 1
    assert a.query_alignment_length == 10 + 2 + 8
    assert a.reference_length == 10 + 3 + 8
    assert a.reference_end == 99 + 21


def test_sam_text_parse(tmp_path):
    p = tmp_path / "t.sam"
    p.write_text("@SQ\tSN:ref\tLN:100\n"
                 "r1\t0\tref\t11\t60\t4S6M\tACGTACGTAC\t*\t*\t*\t*\n"
                 "r2\t4\t*\t0\t0\t*\t*\t*\t*\t*\t*\n")
    alns = list(sam.iter_alignments(str(p)))
    assert len(alns) == 2
    assert alns[0].query_name == "r1"
    assert alns[0].reference_start == 10
    assert alns[0].reference_end == 16
    assert alns[1].is_unmapped


@needs_fixtures
def test_sam_fixture_parses():
    alns = list(sam.iter_alignments(SAM_FILE))
    assert len(alns) >= 1
    for a in alns:
        if a.flag in (0, 16):
            assert a.reference_length > 0
            assert 0.0 < a.query_alignment_length / a.query_length <= 1.0


@needs_fixtures
def test_single_read_fast5():
    files = fast5utils.get_fast5_file_list(READS_DIR)
    assert len(files) == 5
    with fast5utils.get_fast5_file(files[0]) as f5:
        rids = f5.get_read_ids()
        assert len(rids) == 1
        read = f5.get_read(rids[0])
        dacs = read.get_raw_data()
        assert dacs.dtype == np.int16 and len(dacs) > 1000
        info = fast5utils.get_channel_info(read)
        assert "digitisation" in info and "sampling_rate" in info


@needs_fixtures
def test_multi_read_fast5_matches_single():
    multi = fast5utils.get_fast5_file_list(MULTIREAD_DIR)[0]
    with fast5utils.get_fast5_file(multi) as f5:
        rids = f5.get_read_ids()
        assert len(rids) == 5
        rid = rids[0]
        sig_multi = f5.get_read(rid).get_raw_data()
    single_path = os.path.join(READS_DIR, rid + ".fast5")
    with fast5utils.get_fast5_file(single_path) as f5:
        sig_single = f5.get_read(rid).get_raw_data()
    np.testing.assert_array_equal(sig_multi, sig_single)


@needs_fixtures
def test_iterate_fast5_reads_with_limit():
    pairs = list(fast5utils.iterate_fast5_reads(READS_DIR, limit=3))
    assert len(pairs) == 3
    pairs_all = list(fast5utils.iterate_fast5_reads(READS_DIR))
    assert len(pairs_all) == 5


@needs_fixtures
def test_strand_list_conventions(tmp_path):
    pairs = list(fast5utils.iterate_fast5_reads(READS_DIR))
    rid = pairs[0][1]
    # (A) read_id only
    sl = tmp_path / "sl.tsv"
    sl.write_text("read_id\n{}\n".format(rid))
    got = list(fast5utils.iterate_fast5_reads(READS_DIR,
                                              strand_list=str(sl)))
    assert got == [p for p in pairs if p[1] == rid]
    # (C) filename + read_id
    fname = os.path.basename(pairs[0][0])
    sl2 = tmp_path / "sl2.tsv"
    sl2.write_text("filename_fast5\tread_id\n{}\t{}\n".format(fname, rid))
    got2 = list(fast5utils.iterate_fast5_reads(READS_DIR,
                                               strand_list=str(sl2)))
    assert len(got2) == 1 and got2[0][1] == rid
    # (B) filename only: every read in the named files
    fnames = sorted({os.path.basename(p[0]) for p in pairs})[:2]
    sl3 = tmp_path / "sl3.tsv"
    sl3.write_text("filename_fast5\n" + "".join(
        "{}\n".format(f) for f in fnames))
    got3 = list(fast5utils.iterate_fast5_reads(READS_DIR,
                                               strand_list=str(sl3)))
    expect3 = [p for p in pairs if os.path.basename(p[0]) in set(fnames)]
    assert sorted(got3) == sorted(expect3)
    # invalid list: no usable column
    sl4 = tmp_path / "sl4.tsv"
    sl4.write_text("bogus\n1\n")
    with pytest.raises(Exception):
        list(fast5utils.iterate_fast5_reads(READS_DIR,
                                            strand_list=str(sl4)))


@needs_fixtures
def test_signal_from_fast5_matches_readparams_fixture():
    """med/MAD of trimmed current must reproduce the shipped
    readparams.tsv (bit-level parity check of Signal + med_mad)."""
    from taiyaki_tpu.utils.fileio import readtsv
    table = readtsv("/root/reference/test/data/readparams.tsv")
    by_id = {str(r["UUID"]): (float(r["shift"]), float(r["scale"]))
             for r in table}
    n_checked = 0
    for path, rid in fast5utils.iterate_fast5_reads(READS_DIR):
        if rid not in by_id:
            continue
        with fast5utils.get_fast5_file(path) as f5:
            sig = Signal(f5.get_read(rid))
        shift, scale = med_mad(sig.current)
        assert abs(shift - by_id[rid][0]) < 1e-6
        assert abs(scale - by_id[rid][1]) < 1e-6
        n_checked += 1
    assert n_checked == 5
