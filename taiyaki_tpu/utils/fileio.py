"""TSV / delimited file IO (reference: taiyaki/fileio.py).

readtsv loads a TAB-separated file with a header row into a numpy
recarray, transparently handling .gz/.bz2.  Tab (not whitespace)
delimiting matters: fast5 filenames in strand lists may contain spaces
(reference fileio.py:118 uses delimiter='\t').
"""

import bz2
import gzip

import numpy as np


def _open_any(filename, mode="rt"):
    if filename.endswith(".gz"):
        return gzip.open(filename, mode)
    if filename.endswith(".bz2"):
        return bz2.open(filename, mode)
    return open(filename, mode)


def file_has_fields(filename, fields=None):
    """True if the file's TAB-separated header row contains every named
    field (reference: fileio.py:30-61)."""
    if fields is None:
        return True
    with _open_any(filename) as fh:
        header = fh.readline().rstrip("\n").split("\t")
    present = set(header)
    return all(f in present for f in fields)


def readtsv(filename, fields=None, **kwargs):
    """Read a TSV (whitespace-delimited, with header) into a recarray.

    Args:
        fields: if given, assert these columns are present.
    """
    if not file_has_fields(filename, fields):
        raise KeyError("File {} does not contain requested required fields "
                       "{}".format(filename, fields))
    kwargs.setdefault("delimiter", "\t")
    table = np.genfromtxt(filename, names=True, dtype=None,
                          encoding="utf-8", **kwargs)
    # genfromtxt of a single row returns 0-d; normalise to 1-d
    return np.atleast_1d(table).view(np.recarray)


def read_chunks(filename, n_lines, n_chunks=None, header=True):
    """Yield successive chunks of a file as LISTS OF RAW LINES (the
    reference's contract, fileio.py:64-91: raw lines, so no dtype
    truncation and ragged rows pass through untouched; materialized per
    chunk so they outlive the file handle).  The first chunk includes
    the header line when header=True."""
    from itertools import islice

    with _open_any(filename) as fh:
        first = True
        yielded = 0
        while True:
            n = n_lines + (1 if first and header else 0)
            first = False
            # materialize the chunk (bounded by n_lines) so it stays
            # valid after the file closes / the generator advances
            chunk = list(islice(fh, n))
            if not chunk:
                break
            yield chunk
            yielded += 1
            if n_chunks is not None and yielded == n_chunks:
                break
