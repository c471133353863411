"""Host-side math utilities (numpy).

Reference behavior: taiyaki/maths.py (med_mad :8, mad :35, logsumexp :55,
rle :81, RollingQuantile :104, RollingMAD :138).
"""

import numpy as np

# Scale factor relating the median absolute deviation of a Gaussian to its
# standard deviation: 1 / Phi^-1(0.75).
MAD_SD_FACTOR = 1.4826


def med_mad(data, factor=MAD_SD_FACTOR, axis=None, keepdims=False):
    """Median and scaled median absolute deviation.

    With the default factor the MAD estimates the standard deviation for
    Gaussian data.

    Returns:
        (median, mad) tuple of floats or arrays.
    """
    data = np.asarray(data)
    dmed = np.median(data, axis=axis, keepdims=True)
    dmad = factor * np.median(np.abs(data - dmed), axis=axis, keepdims=True)
    if not keepdims:
        if axis is None:
            dmed = dmed.flatten()[0]
            dmad = dmad.flatten()[0]
        else:
            dmed = np.squeeze(dmed, axis=axis)
            dmad = np.squeeze(dmad, axis=axis)
    return dmed, dmad


def mad(data, factor=MAD_SD_FACTOR, axis=None, keepdims=False):
    """Scaled median absolute deviation (see med_mad)."""
    return med_mad(data, factor=factor, axis=axis, keepdims=keepdims)[1]


def logsumexp(x, axis=None, keepdims=False):
    """Stable log(sum(exp(x)))."""
    x = np.asarray(x)
    xmax = np.max(x, axis=axis, keepdims=True)
    out = xmax + np.log(np.sum(np.exp(x - xmax), axis=axis, keepdims=True))
    if not keepdims:
        out = np.squeeze(out, axis=axis) if axis is not None else out.item()
    return out


def rle(x, tol=0):
    """Run-length encode a vector.

    Args:
        x: 1D array.
        tol: elements within tol of each other are treated as equal.

    Returns:
        recarray with fields 'start' and 'length' for each run.
    """
    x = np.asarray(x)
    if len(x) == 0:
        return np.zeros(0, dtype=[("start", int), ("length", int)]).view(
            np.recarray)
    if tol == 0:
        breaks = x[1:] != x[:-1]
    else:
        breaks = np.abs(np.diff(x)) > tol
    starts = np.concatenate([[0], np.nonzero(breaks)[0] + 1])
    lengths = np.diff(np.concatenate([starts, [len(x)]]))
    out = np.zeros(len(starts), dtype=[("start", int), ("length", int)])
    out["start"] = starts
    out["length"] = lengths
    return out.view(np.recarray)


class RollingQuantile:
    """Rolling quantile over a bounded history window.

    Used to cap gradient norms at (e.g.) the rolling 90th percentile of
    recent gradient norms.
    """

    def __init__(self, upper_quantile, window=100, min_data=1,
                 default_to=None):
        self.upper_quantile = upper_quantile
        self.window = window
        self.min_data = min_data
        self.default_to = default_to
        self._history = []

    def update(self, value):
        """Add a value to the history; return the value exceeded by
        upper_quantile of the window (or the default while fewer than
        min_data values have been seen)."""
        self._history.append(float(value))
        if len(self._history) > self.window:
            self._history.pop(0)
        if len(self._history) < self.min_data:
            return self.default_to
        return float(np.quantile(self._history, 1.0 - self.upper_quantile))


class RollingMAD:
    """Per-element rolling median + n * MAD threshold tracker.

    Tracks a window of recent absolute values for `nparams` independent
    streams (one per model parameter tensor) and returns, for each stream,
        median(window) + n_mads * mad(window)
    which is used as a per-parameter gradient clipping threshold.
    """

    def __init__(self, nparams, n_mads=0, window=1000, default_to=None):
        self.n_mads = n_mads
        self.default_to = default_to
        self._window_data = np.empty((nparams, window), dtype=float)
        self._valid_cols = 0
        self._next_col = 0

    @property
    def nparams(self):
        return self._window_data.shape[0]

    @property
    def window(self):
        return self._window_data.shape[1]

    def update(self, values):
        """Add one value per stream; return per-stream thresholds
        median + n_mads * mad over the window (default_to until the window
        has filled)."""
        values = np.asarray(values, dtype=float)
        assert values.shape == (self.nparams,)
        self._window_data[:, self._next_col] = values
        self._next_col = (self._next_col + 1) % self.window
        self._valid_cols = min(self._valid_cols + 1, self.window)
        if self._valid_cols < self.window:
            return self.default_to
        med, dev = med_mad(self._window_data, axis=1)
        return med + self.n_mads * dev
