"""Mapped-signal file format (HDF5, version 8) — reader/writer.

Byte-compatible with the reference's format (taiyaki/mapped_signal_files.py;
spec in its docs/FILE_FORMATS.md "Mapped signal files (v. 8)"), which is the
interop contract between dataset preparation and training — files written by
either framework load in the other.

Two layouts:
* per-read: root attrs {version, alphabet, collapse_alphabet,
  mod_long_names}; group /Reads/<read_id> with one dataset per array field
  and one attr per scalar field; root dataset read_ids.
* batch: group /Batches/Batch_N holding per-field concatenated arrays plus
  <field>_lengths split vectors; scalar fields stored as per-read vectors.
"""

import posixpath

import h5py
import numpy as np

from taiyaki_tpu.alphabet import AlphabetInfo
from taiyaki_tpu.data.signal_mapping import (
    OPTIONAL_FIELDS, REQUIRED_FIELDS, SignalMapping)

_version = 8
READS_ROOT = "Reads"
BATCH_ROOT = "Batches"
BATCH_TMPLT = "Batch_{}"
LENGTH_SUFFIX = "_lengths"
VLEN_STR = h5py.special_dtype(vlen=str)


def _field_dtype(name):
    if name in REQUIRED_FIELDS:
        return REQUIRED_FIELDS[name]
    return OPTIONAL_FIELDS[name]


def _is_array_field(name):
    dt = _field_dtype(name)
    return not isinstance(dt, type) or issubclass(dt, np.generic)


class _ReaderBase:
    """Shared reader behavior: context manager, reads() generator, whole-file
    check()."""

    pass_str = "pass"

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    @property
    def version(self):
        return self.hdf5.attrs["version"]

    def get_alphabet_information(self):
        mod_long_names = self.hdf5.attrs["mod_long_names"].splitlines()
        return AlphabetInfo(self.hdf5.attrs["alphabet"],
                            self.hdf5.attrs["collapse_alphabet"],
                            mod_long_names)

    def reads(self, read_ids=None):
        """Generator over SignalMapping objects, optionally restricted to a
        set of read ids."""
        if read_ids is None:
            yield from iter(self)
        else:
            yield from self._some_reads(read_ids)

    def check(self, limit_report_lines=100):
        """Check every read in the file; 'pass' or a report string."""
        report = []
        if "version" not in self.hdf5.attrs:
            report.append("Can't get version number")
        elif self.hdf5.attrs["version"] != _version:
            report.append("Version number of file is {} and should be {}"
                          .format(self.hdf5.attrs["version"], _version))
        nreads = 0
        for read in self:
            nreads += 1
            if sum(r.count("\n") + 1 for r in report) >= limit_report_lines:
                report.append("Number of lines in error report limited")
                break
            verdict = read.check()
            if verdict != SignalMapping.pass_str:
                report.append("Read " + read.read_id + ":\n" + verdict)
        if nreads == 0:
            report.append("No reads in file")
        if not report:
            return self.pass_str
        return "\n".join(report) + "\n"


class _WriterBase:
    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def _write_header(self, alphabet_info):
        self.hdf5.attrs["version"] = _version
        self.hdf5.attrs["alphabet"] = alphabet_info.alphabet
        self.hdf5.attrs["collapse_alphabet"] = alphabet_info.collapse_alphabet
        self.hdf5.attrs["mod_long_names"] = "\n".join(
            alphabet_info.mod_long_names)

    def _write_read_ids_index(self):
        if not self.read_ids:
            return
        arr = np.array(self.read_ids, dtype=VLEN_STR)
        ds = self.hdf5.create_dataset("read_ids", arr.shape, dtype=VLEN_STR,
                                      compression="gzip")
        ds[...] = arr


class PerReadHDF5Reader(_ReaderBase):
    """Reader for the per-read layout."""

    def __init__(self, filename, load_in_mem=False):
        self.hdf5 = h5py.File(filename, "r", libver="v108",
                              driver="core" if load_in_mem else None)
        assert self.version == _version, (
            "Incorrect file version, got {} expected {}".format(
                self.version, _version))

    def close(self):
        self.hdf5.close()

    def __iter__(self):
        for group in self.hdf5[READS_ROOT].values():
            yield self._read_from_group(group)

    def _some_reads(self, read_ids):
        # sorted: set iteration order varies per process (str hash
        # randomization), which would break the trainer's shared-seed
        # index-based holdout across hosts / reruns
        present = sorted(set(read_ids).intersection(self.get_read_ids()))
        for read_id in present:
            yield self.get_read(read_id)

    @staticmethod
    def _read_from_group(group):
        fields = {k: v[()] for k, v in group.items()}
        fields.update(group.attrs.items())
        return SignalMapping(**fields)

    def get_read(self, read_id):
        return self._read_from_group(
            self.hdf5[posixpath.join(READS_ROOT, read_id)])

    def get_read_ids(self):
        if "read_ids" in self.hdf5:
            return [_dec(v) for v in self.hdf5["read_ids"][()]]
        if READS_ROOT in self.hdf5:
            return list(self.hdf5[READS_ROOT].keys())
        return []


class PerReadHDF5Writer(_WriterBase):
    """Writer for the per-read layout."""

    def __init__(self, filename, alphabet_info):
        self.hdf5 = h5py.File(filename, "w", libver="v108", track_order=True)
        self._write_header(alphabet_info)
        self.read_ids = []

    def write_read(self, readdict):
        read_id = readdict["read_id"]
        self.read_ids.append(read_id)
        g = self.hdf5.create_group(posixpath.join(READS_ROOT, read_id))
        for k, v in readdict.items():
            if isinstance(v, np.ndarray):
                g.create_dataset(k, data=v, compression="gzip", shuffle=True)
            else:
                g.attrs[k] = v

    def close(self):
        self._write_read_ids_index()
        self.hdf5.close()


class BatchHDF5Reader(_ReaderBase):
    """Reader for the batched layout."""

    def __init__(self, filename):
        self.hdf5 = h5py.File(filename, "r")
        assert self.version == _version, (
            "Incorrect file version, got {} expected {}".format(
                self.version, _version))
        self.batch_names = list(self.hdf5[BATCH_ROOT].keys())
        self._read_id_to_batch = {}
        for name in self.batch_names:
            batch = self.hdf5[BATCH_ROOT][name]
            for rid in batch["read_id"][()]:
                self._read_id_to_batch[_dec(rid)] = name

    def close(self):
        self.hdf5.close()

    def __iter__(self):
        for name in self.batch_names:
            yield from self._load_batch(name).values()

    def _some_reads(self, read_ids):
        # sorted for cross-process determinism (see PerReadHDF5Reader)
        wanted = sorted(set(read_ids).intersection(self.get_read_ids()))
        by_batch = {}
        for rid in wanted:
            by_batch.setdefault(self._read_id_to_batch[rid], []).append(rid)
        for name, rids in by_batch.items():
            batch = self._load_batch(name)
            for rid in rids:
                yield batch[rid]

    def _load_batch(self, name):
        if name not in self.batch_names:
            raise RuntimeError("Invalid batch name requested: {}".format(
                name))
        group = self.hdf5[BATCH_ROOT][name]
        fields = [k for k in group.keys() if not k.endswith(LENGTH_SUFFIX)]
        columns = {}
        for k in fields:
            data = group[k][()]
            if _is_array_field(k):
                splits = np.cumsum(group[k + LENGTH_SUFFIX][:-1])
                columns[k] = np.split(data, splits)
            else:
                columns[k] = [_dec(v) if _field_dtype(k) is str else v
                              for v in data]
        out = {}
        for row in zip(*columns.values()):
            fields_d = dict(zip(columns.keys(), row))
            out[fields_d["read_id"]] = SignalMapping(**fields_d)
        return out

    def get_read(self, read_id):
        return self._load_batch(self._read_id_to_batch[read_id])[read_id]

    def get_read_ids(self):
        return list(self._read_id_to_batch.keys())


class BatchHDF5Writer(_WriterBase):
    """Writer for the batched layout (default batch_size 25000 reads)."""

    def __init__(self, filename, alphabet_info, batch_size=25000):
        self.hdf5 = h5py.File(filename, "w")
        self._write_header(alphabet_info)
        self.read_ids = []
        self.batch_size = batch_size
        self._pending = []
        self._batch_idx = 0

    def write_read(self, readdict):
        self.read_ids.append(readdict["read_id"])
        self._pending.append(readdict)
        if len(self._pending) >= self.batch_size:
            self._flush_batch()

    def _flush_batch(self):
        g = self.hdf5.create_group(
            BATCH_ROOT + "/" + BATCH_TMPLT.format(self._batch_idx))
        keys = sorted(set(k for rd in self._pending for k in rd.keys()))
        for k in keys:
            dtype = _field_dtype(k)
            if _is_array_field(k):
                lengths = np.zeros(len(self._pending), dtype=np.int32)
                vals = []
                for i, rd in enumerate(self._pending):
                    if k in rd:
                        vals.append(rd[k])
                        lengths[i] = len(rd[k])
                concat = np.concatenate(vals).astype(dtype)
                g.create_dataset(k, data=concat, compression="gzip",
                                 shuffle=True)
                g.create_dataset(k + LENGTH_SUFFIX, data=lengths,
                                 compression="gzip", shuffle=True)
            elif dtype is str:
                vals = np.array([rd.get(k, "") for rd in self._pending],
                                dtype=VLEN_STR)
                ds = g.create_dataset(k, vals.shape, dtype=VLEN_STR,
                                      compression="gzip")
                ds[...] = vals
            else:
                # Missing optional scalars are stored as 0 — the batch
                # format has no absence encoding, and the reference's
                # writer does the same (mapped_signal_files.py:633), so
                # 0 here is the interop contract, not a choice.
                vals = np.array([rd.get(k, 0) for rd in self._pending],
                                dtype=dtype)
                g.create_dataset(k, data=vals, compression="gzip",
                                 shuffle=True)
        self._pending = []
        self._batch_idx += 1

    def close(self):
        self._write_read_ids_index()
        if self._pending:
            self._flush_batch()
        self.hdf5.close()


def _dec(v):
    return v.decode() if isinstance(v, bytes) else v


def HDF5Reader(filename, load_in_mem=False):
    """Open a mapped-signal file, auto-detecting the layout."""
    with h5py.File(filename, "r") as f:
        is_batch = BATCH_ROOT in f
    if is_batch:
        return BatchHDF5Reader(filename)
    return PerReadHDF5Reader(filename, load_in_mem)


def HDF5Writer(filename, alphabet_info, batch_format=True):
    """Create a mapped-signal file in the batch (default) or per-read
    layout."""
    if batch_format:
        return BatchHDF5Writer(filename, alphabet_info)
    return PerReadHDF5Writer(filename, alphabet_info)


MappedSignalReader = HDF5Reader
MappedSignalWriter = HDF5Writer
