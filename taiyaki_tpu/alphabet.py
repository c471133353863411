"""Alphabet and modified-base bookkeeping.

Reference behavior: taiyaki/alphabet.py (AlphabetInfo :4).  Attribute names
(`alphabet`, `collapse_alphabet`, `mod_long_names`, `can_bases`, `mod_bases`,
`nbase`, `ncan_base`, `nmod_base`, `collapse_labels`, ...) are interop
contracts used by mapped-signal files and cat_mod model heads.
"""

import numpy as np


class AlphabetInfo:
    """Summary of an alphabet with optional modified bases.

    Args:
        alphabet: single-letter codes for every label in the training data,
            e.g. "ACGTZ" where Z is 5mC.
        collapse_alphabet: canonical base for each letter of `alphabet`
            (same length; values must be a subset of `alphabet`), e.g.
            "ACGTC".
        mod_long_names: long name for each modified (non-canonical) base, in
            alphabet order.
        do_reorder: sort the alphabet into canonical grouping (each canonical
            base followed by its mods) — required when *building* a cat_mod
            model; must be False when the alphabet comes from a mapped-signal
            file (its label order is fixed).

    Derived attributes:
        nbase / ncan_base / nmod_base: counts.
        can_bases / mod_bases: strings in alphabet order.
        collapse_labels: int32 array mapping each alphabet label to the label
            of its canonical base.
        translation_table: str.translate table alphabet -> collapse_alphabet.
        mod_name_conv: dict mod letter -> long name.
    """

    def __init__(self, alphabet, collapse_alphabet, mod_long_names=[],
                 do_reorder=False):
        if isinstance(alphabet, bytes):
            alphabet = alphabet.decode()
        if isinstance(collapse_alphabet, bytes):
            collapse_alphabet = collapse_alphabet.decode()
        self.alphabet = alphabet
        self.collapse_alphabet = collapse_alphabet
        self.mod_long_names = mod_long_names

        assert len(self.alphabet) == len(self.collapse_alphabet), (
            "alphabet ({}) and collapse_alphabet ({}) must be the same "
            "length".format(self.alphabet, self.collapse_alphabet))
        self._derive()
        self._validate()

        self.is_sorted = False
        if do_reorder:
            self.sort_alphabet()

    def _derive(self):
        """Compute attributes from (alphabet, collapse_alphabet)."""
        self.translation_table = str.maketrans(self.alphabet,
                                               self.collapse_alphabet)
        self.nbase = len(self.alphabet)
        self.can_bases_set = set(self.collapse_alphabet)
        self.mod_bases_set = set(self.alphabet) - self.can_bases_set
        self.ncan_base = len(self.can_bases_set)
        self.nmod_base = self.nbase - self.ncan_base
        if self.mod_long_names is None:
            self.mod_name_conv = None
        else:
            in_order_mods = [b for b in self.alphabet
                             if b in self.mod_bases_set]
            self.mod_name_conv = dict(zip(in_order_mods, self.mod_long_names))
        self._derive_ordered()

    def _derive_ordered(self):
        """Attributes that depend on the current ordering of the alphabet."""
        self.collapse_labels = np.array(
            [self.alphabet.index(b) for b in self.collapse_alphabet],
            dtype=np.int32)
        self.can_bases = "".join(b for b in self.alphabet
                                 if b in self.can_bases_set)
        self.mod_bases = "".join(b for b in self.alphabet
                                 if b in self.mod_bases_set)

    def _validate(self):
        assert len(self.alphabet) == len(self.collapse_alphabet), (
            "alphabet ({}) and collapse_alphabet ({}) must be the same "
            "length".format(self.alphabet, self.collapse_alphabet))
        assert self.can_bases_set <= set(self.alphabet), (
            "All bases in collapse_alphabet must occur within alphabet.")
        if self.nmod_base > 0:
            assert self.mod_long_names is not None, (
                "mod_long_names required when alphabet has modified bases")
            assert len(self.mod_long_names) == self.nmod_base, (
                "Need one long name per modified base: {} mods but names "
                "{!r}".format(self.nmod_base, self.mod_long_names))

    def sort_alphabet(self):
        """Re-order to canonical grouping: each canonical base followed by
        its modified bases (sorted by (canonical base, mod letter))."""
        pairs = sorted(zip(self.collapse_alphabet, self.alphabet))
        self.collapse_alphabet = "".join(p[0] for p in pairs)
        self.alphabet = "".join(p[1] for p in pairs)
        if self.mod_long_names is not None:
            self.mod_long_names = [self.mod_name_conv[b] for b in self.alphabet
                                   if b in self.mod_bases_set]
        self.is_sorted = True
        self.translation_table = str.maketrans(self.alphabet,
                                               self.collapse_alphabet)
        self._derive_ordered()

    def contains_modified_bases(self):
        return self.nmod_base > 0

    def collapse_sequence(self, sequence_with_mods):
        """Replace modified bases with their canonical counterparts."""
        return sequence_with_mods.translate(self.translation_table)

    def equals(self, other):
        return (self.alphabet == other.alphabet
                and self.collapse_alphabet == other.collapse_alphabet
                and self.mod_long_names == other.mod_long_names)

    def is_compatible_model(self, network):
        """Check a model's output head matches this alphabet.

        cat_mod heads carry the full alphabet spec; canonical heads only the
        number of bases (reference: alphabet.py:106-118).
        """
        head = network.sublayers[-1]
        if hasattr(head, "alphabet"):
            return all([
                self.alphabet == head.alphabet,
                self.collapse_alphabet == head.collapse_alphabet,
                self.mod_long_names == head.mod_long_names,
                self.mod_name_conv == head.mod_name_conv,
                self.can_bases == head.can_bases,
                self.mod_bases == head.mod_bases,
                self.ncan_base == head.ncan_base,
                self.nmod_base == head.nmod_base,
            ])
        return self.nbase == head.nbase

    def compute_mod_inv_freq_weights(self, read_data, nsample):
        """Inverse-frequency loss weights for modified bases, in cat_mod
        output order (canonical base weight 1.0 followed by
        can_count/mod_count for each of its mods)."""
        labels = self._sample_labels(read_data, nsample)
        counts = np.bincount(labels, minlength=self.nbase)
        if np.any(counts[:self.nbase] == 0):
            raise NotImplementedError(
                "All alphabet labels must occur in the sampled reads")
        weights = []
        for can_lab in range(self.ncan_base):
            weights.append(1.0)
            for mod_lab in np.nonzero(self.collapse_labels == can_lab)[0][1:]:
                weights.append(counts[can_lab] / counts[mod_lab])
        return np.array(weights, dtype=np.float32)

    def compute_log_odds_weights(self, read_data, nsample):
        """Log-odds style loss weights in cat_mod output order: for each
        canonical base, sum(mod counts)/can_count then can_count/mod_count
        per mod."""
        labels = self._sample_labels(read_data, nsample)
        counts = np.bincount(labels, minlength=self.nbase)
        if np.any(counts[:self.nbase] == 0):
            raise NotImplementedError(
                "All alphabet labels must occur in the sampled reads")
        weights = []
        for can_b in self.can_bases:
            can_lab = self.alphabet.index(can_b)
            mod_labs = np.nonzero(self.collapse_labels == can_lab)[0][1:]
            weights.append(sum(counts[m] for m in mod_labs) / counts[can_lab])
            for mod_lab in mod_labs:
                weights.append(counts[can_lab] / counts[mod_lab])
        return np.array(weights, dtype=np.float32)

    @staticmethod
    def _sample_labels(read_data, nsample):
        nsample = min(nsample, len(read_data))
        chosen = np.random.choice(len(read_data), nsample, replace=False)
        return np.concatenate([read_data[i].Reference for i in chosen])

    def __str__(self):
        out = "canonical alphabet {}".format(self.can_bases)
        if self.nmod_base == 0:
            return out + " and no modified bases"
        mods = ", ".join(
            "{}={} (alt to {})".format(b, self.mod_name_conv[b], can_b)
            for b, can_b in zip(self.alphabet, self.collapse_alphabet)
            if b in self.mod_bases_set)
        return out + " with modified base(s) {}".format(mods)
