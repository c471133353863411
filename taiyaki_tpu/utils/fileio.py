"""TSV / delimited file IO (reference: taiyaki/fileio.py).

readtsv loads a whitespace/tab-separated file with a header row into a numpy
recarray, transparently handling .gz/.bz2.
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
    """True if the file's header row contains every named field."""
    if fields is None:
        return True
    with _open_any(filename) as fh:
        header = fh.readline().strip().split()
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
    table = np.genfromtxt(filename, names=True, dtype=None,
                          encoding="utf-8", **kwargs)
    # genfromtxt of a single row returns 0-d; normalise to 1-d
    return np.atleast_1d(table).view(np.recarray)


def read_chunks(filename, chunk_size=10000):
    """Yield successive recarray chunks of a large TSV."""
    with _open_any(filename) as fh:
        header = fh.readline().strip().split()
        rows = []
        for line in fh:
            rows.append(tuple(line.strip().split()))
            if len(rows) >= chunk_size:
                yield np.array(rows, dtype=[(h, "U64") for h in header]).view(
                    np.recarray)
                rows = []
        if rows:
            yield np.array(rows, dtype=[(h, "U64") for h in header]).view(
                np.recarray)
