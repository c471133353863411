"""Native glocal aligner (decodeutil/seqalign.cpp) and the bwa-free
alignment fallback in misc/align.py.

The reference scores basecall accuracy via external bwa mem
(/root/reference/misc/align.py); this framework ships its own exact
glocal affine-gap DP for environments without an aligner binary, and
the accuracy pipeline (misc/align.py -> misc/assess_alignment.py) runs
on its SAM output.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "misc"))

from taiyaki_tpu import decodeutil  # noqa: E402


def test_exact_match():
    score, rs, re, cigar, nm = decodeutil.seq_align(
        "ACGTACGT", "TTACGTACGTTT")
    assert (score, rs, re, cigar, nm) == (8, 2, 10, [("M", 8)], 0)


def test_mismatch_scored_and_counted():
    score, rs, re, cigar, nm = decodeutil.seq_align(
        "ACGAACGT", "TTACGTACGTTT")
    assert cigar == [("M", 8)] and nm == 1 and score == 7 - 2


def test_deletion_and_insertion():
    _, _, _, cigar, nm = decodeutil.seq_align("ACGTCGT", "TTACGTACGTTT")
    assert ("D", 1) in cigar and nm == 1
    _, _, _, cigar, nm = decodeutil.seq_align(
        "ACGTTTACGT", "TTACGTACGTTT")
    assert ("I", 2) in cigar and nm == 2


def test_query_global_ref_local():
    """Reference overhang is free; query overhang costs a gap."""
    score, rs, re, _, _ = decodeutil.seq_align("CCCC", "AAAACCCCAAAA")
    assert score == 4 and (rs, re) == (4, 8)


def test_cigar_consistency_random():
    """CIGAR query/ref lengths must equal the inputs' spans, and NM must
    equal an independent recount along the alignment."""
    rng = np.random.RandomState(3)
    bases = "ACGT"
    for _ in range(20):
        ref = "".join(rng.choice(list(bases), 500))
        # mutate a copy: 5% sub, 2% del, 2% ins
        q = []
        for b in ref[50:450]:
            r = rng.rand()
            if r < 0.05:
                q.append(bases[rng.randint(4)])
            elif r < 0.07:
                continue
            elif r < 0.09:
                q.append(b)
                q.append(bases[rng.randint(4)])
            else:
                q.append(b)
        query = "".join(q)
        score, rs, re, cigar, nm = decodeutil.seq_align(query, ref)
        qlen = sum(n for op, n in cigar if op in "MI")
        rlen = sum(n for op, n in cigar if op in "MD")
        assert qlen == len(query)
        assert rlen == re - rs
        # independent NM recount by walking the cigar
        qi, ri, edits = 0, rs, 0
        for op, n in cigar:
            if op == "M":
                edits += sum(query[qi + k] != ref[ri + k] for k in range(n))
                qi += n
                ri += n
            elif op == "I":
                edits += n
                qi += n
            else:
                edits += n
                ri += n
        assert edits == nm


def test_builtin_align_pipeline(tmp_path):
    """fasta queries -> built-in aligner -> SAM -> assess accuracy."""
    import align as align_mod

    rng = np.random.RandomState(7)
    bases = "ACGT"
    ref = "".join(rng.choice(list(bases), 800))
    comp = str.maketrans("ACGT", "TGCA")

    genome = tmp_path / "refs.fa"
    genome.write_text(">ref1\n{}\n".format(ref))
    # q1: exact slice; q2: reverse-complement slice; q3: 5% mutated
    q3 = "".join(b if rng.rand() > 0.05 else bases[rng.randint(4)]
                 for b in ref[100:700])
    queries = tmp_path / "reads.fa"
    queries.write_text(
        ">q1\n{}\n>q2\n{}\n>q3\n{}\n".format(
            ref[200:600], ref[150:650].translate(comp)[::-1], q3))

    sam = tmp_path / "reads.sam"
    align_mod.builtin_align(str(queries), str(sam), str(genome))

    from assess_alignment import samacc
    accs = {m.query: m for m in samacc(str(sam), min_coverage=0.6)}
    assert accs["q1"].accuracy == 1.0 and accs["q1"].strand == "+"
    assert accs["q2"].accuracy == 1.0 and accs["q2"].strand == "-"
    assert 0.9 < accs["q3"].accuracy < 1.0


def test_align_cli_end_to_end(tmp_path):
    """misc/align.py CLI on a fasta produces the summary report via the
    built-in aligner (no bwa in this environment)."""
    rng = np.random.RandomState(11)
    ref = "".join(rng.choice(list("ACGT"), 400))
    genome = tmp_path / "refs.fa"
    genome.write_text(">r\n{}\n".format(ref))
    queries = tmp_path / "q.fa"
    queries.write_text(">a\n{}\n".format(ref[50:350]))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "misc", "align.py"),
         str(queries), "--reference", str(genome)],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Mean accuracy:  1.00000" in r.stdout
    assert (tmp_path / "q.sam").exists()
    assert (tmp_path / "q.samacc").exists()
