import numpy as np
import pytest

from taiyaki_tpu.alphabet import AlphabetInfo


def test_canonical_alphabet():
    ai = AlphabetInfo("ACGT", "ACGT")
    assert ai.nbase == 4
    assert ai.ncan_base == 4
    assert ai.nmod_base == 0
    assert ai.can_bases == "ACGT"
    assert ai.mod_bases == ""
    assert not ai.contains_modified_bases()
    np.testing.assert_array_equal(ai.collapse_labels, [0, 1, 2, 3])


def test_mod_alphabet():
    ai = AlphabetInfo("ACGTZ", "ACGTC", ["5mC"])
    assert ai.nbase == 5
    assert ai.ncan_base == 4
    assert ai.nmod_base == 1
    assert ai.mod_bases == "Z"
    assert ai.mod_name_conv == {"Z": "5mC"}
    assert ai.collapse_sequence("ACGTZ") == "ACGTC"
    # Z collapses to C which is label 1
    assert ai.collapse_labels[4] == 1


def test_reorder_groups_mods_with_canonical():
    # Documented example: ACGTZYXW / ACGTCAAT -> AYXCZGTW
    ai = AlphabetInfo("ACGTZYXW", "ACGTCAAT",
                      ["mZ", "mY", "mX", "mW"], do_reorder=True)
    assert ai.alphabet == "AXYCZGTW"
    assert ai.collapse_alphabet == "AAACCGTT"
    assert ai.is_sorted


def test_validation_errors():
    with pytest.raises(AssertionError):
        AlphabetInfo("ACGT", "ACG")
    with pytest.raises(AssertionError):
        AlphabetInfo("ACGTZ", "ACGTC", [])  # missing long name


def test_equals():
    a = AlphabetInfo("ACGT", "ACGT")
    b = AlphabetInfo("ACGT", "ACGT")
    c = AlphabetInfo("ACGTZ", "ACGTC", ["5mC"])
    assert a.equals(b)
    assert not a.equals(c)
