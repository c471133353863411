"""Raw read signal abstraction (reference: taiyaki/signal.py).

Holds the untrimmed DAC (digitised current) vector plus channel calibration,
with absolute trimming and pA / standardized-current conversions:

    current_pA   = (dacs + offset) * range / digitisation
    standardized = (current_pA - shift) / scale
"""

import numpy as np

DEFAULT_CHANNEL_INFO = {
    "offset": 0, "range": 1, "digitisation": 1, "sampling_rate": 4000}
DEFAULT_READ_PARAMS = {"trim_start": 0, "trim_end": 0, "shift": 0, "scale": 1}


class Signal:
    """A read's raw signal and calibration.

    Construct either from a fast5 read object (via data.fast5utils) or
    directly from a DAC array for testing.
    """

    def __init__(self, read=None, dacs=None, channel_info=None, read_id=None,
                 read_params=None):
        channel_info = dict(DEFAULT_CHANNEL_INFO if channel_info is None
                            else channel_info)
        read_params = dict(DEFAULT_READ_PARAMS if read_params is None
                           else read_params)
        if read is None:
            if dacs is None:
                raise ValueError("Cannot initialise Signal object: "
                                 "need a fast5 read or a dacs array")
            self.untrimmed_dacs = np.asarray(dacs).copy()
            self.channel_info = channel_info
            self.read_id = read_id
        else:
            from taiyaki_tpu.data import fast5utils
            self.channel_info = dict(fast5utils.get_channel_info(read))
            rid = fast5utils.get_read_attributes(read)["read_id"]
            self.read_id = rid.decode() if isinstance(rid, bytes) else rid
            self.untrimmed_dacs = read.get_raw_data()

        self.sample_rate = self.channel_info["sampling_rate"]
        self.range = self.channel_info["range"]
        self.offset = self.channel_info["offset"]
        self.digitisation = self.channel_info["digitisation"]

        self.signalstart = 0
        self.signalend_exc = len(self.untrimmed_dacs)
        self.set_trim_absolute(read_params["trim_start"],
                               read_params["trim_end"])
        self.shift_from_pA = read_params["shift"]
        self.scale_from_pA = read_params["scale"]

    def set_trim_absolute(self, trimstart, trimend):
        """Trim counts of samples off each end of the *untrimmed* signal.
        If nothing would remain, the trim is ignored entirely."""
        if trimstart < 0 or trimend < 0:
            raise ValueError(
                "Can't trim a negative amount off the end of a signal vector.")
        n = len(self.untrimmed_dacs)
        if trimstart + trimend >= n:
            trimstart = trimend = 0
        self.signalstart = trimstart
        self.signalend_exc = n - trimend

    @property
    def dacs(self):
        """Trimmed DAC values (copy)."""
        return self.untrimmed_dacs[self.signalstart:self.signalend_exc].copy()

    @property
    def untrimmed_current(self):
        """Untrimmed signal in pA."""
        return ((self.untrimmed_dacs + self.offset)
                * self.range / self.digitisation)

    @property
    def current(self):
        """Trimmed signal in pA."""
        return (self.dacs + self.offset) * self.range / self.digitisation

    @property
    def standardized_current(self):
        """Trimmed signal in standardized units."""
        return (self.current - self.shift_from_pA) / self.scale_from_pA
