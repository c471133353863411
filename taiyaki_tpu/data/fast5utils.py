"""Direct h5py access to ONT fast5 files (single- and multi-read layouts).

Self-contained replacement for the reference's ont_fast5_api usage
(taiyaki/fast5utils.py): fast5 files are plain HDF5 —

* single-read: /Raw/Reads/Read_NNNN/{Signal, attrs(read_id, ...)},
  /UniqueGlobalKey/channel_id attrs (digitisation, offset, range,
  sampling_rate).
* multi-read: /read_<read_id>/{Raw/Signal, Raw attrs, channel_id attrs}.
"""

import os
import sys

import h5py
import numpy as np

from taiyaki_tpu.utils.fileio import readtsv


def _dec(v):
    return v.decode() if isinstance(v, bytes) else v


def _read_sort_key(name):
    """Numeric ordering for single-read-layout 'Read_NNN' group names."""
    suffix = name.rsplit("_", 1)[-1]
    return (0, int(suffix), name) if suffix.isdigit() else (1, 0, name)


class Fast5Read:
    """One read inside an open fast5 file."""

    def __init__(self, group, raw_group):
        self._group = group            # group with channel_id subgroup
        self._raw = raw_group          # group whose attrs describe the read

    def get_raw_data(self):
        return np.asarray(self._raw["Signal"][()])

    @property
    def channel_info(self):
        return dict(self._group["channel_id"].attrs)

    @property
    def read_attributes(self):
        return dict(self._raw.attrs)

    @property
    def read_id(self):
        return _dec(self._raw.attrs["read_id"])


def get_channel_info(read):
    """Channel calibration attrs (digitisation, offset, range,
    sampling_rate)."""
    return read.channel_info


def get_read_attributes(read):
    """Per-read attrs (read_id, start_time, duration, ...)."""
    return read.read_attributes


class Fast5File:
    """Open a single- or multi-read fast5, auto-detecting the layout."""

    def __init__(self, filename):
        self.hdf5 = h5py.File(filename, "r")
        self.is_multi = any(k.startswith("read_") for k in self.hdf5.keys())

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def close(self):
        self.hdf5.close()

    def get_read_ids(self):
        if self.is_multi:
            return [k[len("read_"):] for k in self.hdf5.keys()
                    if k.startswith("read_")]
        reads = sorted(self.hdf5["Raw/Reads"].keys(), key=_read_sort_key)
        if not reads:
            return []
        # single-read layout: take the highest-numbered (latest) read
        # (numeric on the Read_NNN suffix: lexicographic puts Read_999
        # after Read_1000)
        grp = self.hdf5["Raw/Reads/" + reads[-1]]
        return [_dec(grp.attrs["read_id"])]

    def get_read(self, read_id):
        if self.is_multi:
            grp = self.hdf5["read_" + read_id]
            return Fast5Read(grp, grp["Raw"])
        reads = sorted(self.hdf5["Raw/Reads"].keys(), key=_read_sort_key)
        for name in reversed(reads):
            raw = self.hdf5["Raw/Reads/" + name]
            if _dec(raw.attrs["read_id"]) == read_id:
                return Fast5Read(self.hdf5["UniqueGlobalKey"], raw)
        raise KeyError("Read {} not present in file".format(read_id))


def get_fast5_file(filename, mode="r"):
    assert mode == "r"
    return Fast5File(filename)


def get_fast5_file_list(path, recursive=False):
    """All .fast5 files under a directory."""
    if not recursive:
        return sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".fast5"))
    out = []
    for root, _, files in os.walk(path):
        out.extend(os.path.join(root, f) for f in files
                   if f.endswith(".fast5"))
    return sorted(out)


def iterate_fast5_reads(path, strand_list=None, limit=None, verbose=0,
                        recursive=False):
    """Yield (filepath, read_id) over a fast5 file or directory.

    Strand-list conventions (reference: fast5utils.py:91-180):
      (A) read_id column only — filter reads by id across all files;
      (B) filename/filename_fast5 column only — all reads in those files;
      (C) both columns — exact (file, read) pairs, verified to exist.
    """
    filepaths = read_ids = None
    if strand_list is not None:
        table = readtsv(strand_list)
        names = table.dtype.names or ()
        if "filename" in names:
            filepaths = [os.path.join(path, str(f))
                         for f in table["filename"]]
        elif "filename_fast5" in names:
            filepaths = [os.path.join(path, str(f))
                         for f in table["filename_fast5"]]
        if "read_id" in names:
            read_ids = [str(i) for i in table["read_id"]]
        if filepaths is None and read_ids is None:
            raise Exception(
                "Strand list at {} has no usable column: need 'filename' or "
                "'filename_fast5' or 'read_id' (or both)".format(strand_list))

    nyielded = 0
    if filepaths is not None and read_ids is not None:
        # case (C): exact pairs
        for filepath, read_id in zip(filepaths, read_ids):
            if not os.path.exists(filepath):
                sys.stderr.write("File {} does not exist, skipping\n"
                                 .format(filepath))
                continue
            try:
                with Fast5File(filepath) as f5:
                    if read_id not in f5.get_read_ids():
                        continue
                yield filepath, read_id
                nyielded += 1
                if limit is not None and nyielded >= limit:
                    return
            except Exception as e:
                sys.stderr.write(
                    "Warning: An exception occured in fast5utils (skipped "
                    "this read):\n{}\n".format(e))
        return

    if filepaths is None:
        if os.path.isdir(path):
            filepaths = get_fast5_file_list(path, recursive=recursive)
        else:
            filepaths = [path]

    wanted = None if read_ids is None else set(read_ids)
    for filepath in filepaths:
        if not os.path.exists(filepath):
            sys.stderr.write("File {} does not exist, skipping\n"
                             .format(filepath))
            continue
        try:
            with Fast5File(filepath) as f5:
                present = f5.get_read_ids()
        except Exception as e:
            sys.stderr.write(
                "Warning: An exception occured in fast5utils (skipped this "
                "read):\n{}\n".format(e))
            continue
        for read_id in present:
            if wanted is not None and read_id not in wanted:
                continue
            yield filepath, read_id
            nyielded += 1
            if limit is not None and nyielded >= limit:
                return
