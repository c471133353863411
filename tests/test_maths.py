import numpy as np

from taiyaki_tpu import maths


def test_med_mad_gaussian():
    rng = np.random.default_rng(0)
    x = rng.normal(3.0, 2.0, size=100000)
    med, dev = maths.med_mad(x)
    assert abs(med - 3.0) < 0.05
    assert abs(dev - 2.0) < 0.05


def test_med_mad_axis():
    x = np.array([[1.0, 2.0, 3.0], [10.0, 20.0, 30.0]])
    med, dev = maths.med_mad(x, axis=1)
    np.testing.assert_allclose(med, [2.0, 20.0])
    np.testing.assert_allclose(dev, [1.4826, 14.826])


def test_logsumexp():
    x = np.array([1.0, 2.0, 3.0])
    expected = np.log(np.sum(np.exp(x)))
    assert abs(maths.logsumexp(x) - expected) < 1e-12


def test_logsumexp_extreme():
    x = np.array([1000.0, 1000.0])
    assert abs(maths.logsumexp(x) - (1000.0 + np.log(2))) < 1e-9


def test_rle():
    runs = maths.rle(np.array([1, 1, 2, 3, 3, 3]))
    np.testing.assert_array_equal(runs.start, [0, 2, 3])
    np.testing.assert_array_equal(runs.length, [2, 1, 3])


def test_rolling_quantile_default_then_value():
    rq = maths.RollingQuantile(0.05, window=10, min_data=5, default_to=99.0)
    for i in range(4):
        assert rq.update(float(i)) == 99.0
    out = rq.update(4.0)
    assert out != 99.0
    # quantile(1-0.05) of [0..4]
    assert abs(out - np.quantile([0, 1, 2, 3, 4], 0.95)) < 1e-12


def test_rolling_mad_window_fill():
    rm = maths.RollingMAD(nparams=2, n_mads=1, window=5, default_to=7.0)
    for i in range(4):
        assert rm.update([1.0, 2.0]) == 7.0
    out = rm.update([1.0, 2.0])
    # constant streams: median = value, mad = 0
    np.testing.assert_allclose(out, [1.0, 2.0])
