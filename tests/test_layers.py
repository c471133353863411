"""Layer library tests.

The recurrent/conv layers are checked for *numerical parity against torch*
with identical weights — torch's LSTM/GRU/Conv1d are the semantics the
reference wraps (taiyaki/layers.py:491,609,744), so agreeing with torch on
CPU means agreeing with the reference.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taiyaki_tpu import activation, layers
from taiyaki_tpu.alphabet import AlphabetInfo
from taiyaki_tpu.utils.json import JsonEncoder

RNG = np.random.default_rng(42)


def rand_input(T=12, B=3, F=8):
    return jnp.asarray(RNG.normal(size=(T, B, F)).astype(np.float32))


def test_orthonormal_matrix_is_orthonormal():
    w = layers.orthonormal_matrix(RNG, 16, 16)
    np.testing.assert_allclose(w @ w.T, np.eye(16), atol=1e-5)
    w2 = layers.orthonormal_matrix(RNG, 48, 16)  # stacked chunks
    for i in range(3):
        c = w2[i * 16:(i + 1) * 16]
        np.testing.assert_allclose(c @ c.T, np.eye(16), atol=1e-5)


def test_truncated_normal_bounds():
    x = layers.truncated_normal(RNG, (10000,), sd=0.5)
    assert np.all(np.abs(x) < 1.0 + 1e-6)
    assert abs(x.mean()) < 0.05


@pytest.mark.parametrize("cls,kwargs", [
    (layers.FeedForward, {}),
    (layers.Softmax, {}),
])
def test_linear_layer_shapes(cls, kwargs):
    layer = cls(8, 5, **kwargs)
    p = layer.init(RNG)
    y = layer.apply(p, rand_input())
    assert y.shape == (12, 3, 5)
    json.dumps(layer.json(p), cls=JsonEncoder)


def test_softmax_normalized():
    layer = layers.Softmax(8, 5)
    p = layer.init(RNG)
    y = layer.apply(p, rand_input())
    np.testing.assert_allclose(np.exp(np.asarray(y)).sum(-1), 1.0, rtol=1e-4)


def test_reverse_involution():
    inner = layers.FeedForward(8, 8)
    layer = layers.Reverse(inner)
    p = layer.init(RNG)
    x = rand_input()
    # FeedForward is time-independent so Reverse(ff) == ff
    np.testing.assert_allclose(np.asarray(layer.apply(p, x)),
                               np.asarray(inner.apply(p["layer"], x)),
                               rtol=1e-6)


def test_residual_and_gated_residual():
    inner = layers.FeedForward(8, 8)
    res = layers.Residual(inner)
    p = res.init(RNG)
    x = rand_input()
    np.testing.assert_allclose(
        np.asarray(res.apply(p, x)),
        np.asarray(x + inner.apply(p["layer"], x)), rtol=1e-6)
    gres = layers.GatedResidual(inner, gate_init=100.0)  # gate ~ 1 => x
    pg = gres.init(RNG)
    np.testing.assert_allclose(np.asarray(gres.apply(pg, x)), np.asarray(x),
                               rtol=1e-4)


def test_parallel_concat_and_product():
    la, lb = layers.FeedForward(8, 3), layers.FeedForward(8, 4)
    par = layers.Parallel([la, lb])
    p = par.init(RNG)
    y = par.apply(p, rand_input())
    assert y.shape == (12, 3, 7)
    prod = layers.Product([layers.FeedForward(8, 3), layers.FeedForward(8, 3)])
    pp = prod.init(RNG)
    assert prod.apply(pp, rand_input()).shape == (12, 3, 3)


def test_softchoice_uniform_at_init():
    subs = [layers.FeedForward(8, 3) for _ in range(3)]
    sc = layers.SoftChoice(subs)
    p = sc.init(RNG)
    x = rand_input()
    expected = sum(np.asarray(l.apply(sp, x))
                   for l, sp in zip(subs, p["sublayers"])) / 3.0
    np.testing.assert_allclose(np.asarray(sc.apply(p, x)), expected,
                               rtol=1e-5)


def test_window_and_updown_sample():
    w = layers.Window(3)
    x = rand_input()
    y = w.apply({}, x)
    assert y.shape == (12, 3, 24)
    # center slice of window == original
    np.testing.assert_allclose(np.asarray(y[..., 8:16]), np.asarray(x))
    ds = layers.DownSample(2)
    us = layers.UpSample(2)
    z = us.apply({}, ds.apply({}, x))
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))


def test_studentise_and_deltasample():
    st = layers.Studentise()
    y = np.asarray(st.apply({}, rand_input(100, 4, 3)))
    assert abs(y.mean()) < 1e-5
    assert abs(y.std() - 1.0) < 1e-2
    d = layers.DeltaSample()
    x = rand_input()
    y = d.apply({}, x)
    np.testing.assert_allclose(np.asarray(y[:-1]), np.asarray(x[1:] - x[:-1]),
                               rtol=1e-6)
    assert np.all(np.asarray(y[-1]) == 0.0)


# -- torch parity ------------------------------------------------------------

def torch_mods():
    torch = pytest.importorskip("torch")
    return torch, torch.nn


def test_lstm_matches_torch():
    torch, nn = torch_mods()
    insize, size, T, B = 6, 10, 15, 4
    layer = layers.Lstm(insize, size)
    p = layer.init(RNG)
    ref = nn.LSTM(insize, size)
    with torch.no_grad():
        ref.weight_ih_l0.copy_(torch.tensor(np.asarray(p["iW"])))
        ref.weight_hh_l0.copy_(torch.tensor(np.asarray(p["sW"])))
        ref.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b"])))
        ref.bias_hh_l0.zero_()
    x = RNG.normal(size=(T, B, insize)).astype(np.float32)
    y_jax = np.asarray(layer.apply(p, jnp.asarray(x)))
    y_ref, _ = ref(torch.tensor(x))
    np.testing.assert_allclose(y_jax, y_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_grumod_matches_torch():
    torch, nn = torch_mods()
    insize, size, T, B = 6, 10, 15, 4
    layer = layers.GruMod(insize, size)
    p = layer.init(RNG)
    ref = nn.GRU(insize, size)
    with torch.no_grad():
        ref.weight_ih_l0.copy_(torch.tensor(np.asarray(p["iW"])))
        ref.weight_hh_l0.copy_(torch.tensor(np.asarray(p["sW"])))
        ref.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b"])))
        ref.bias_hh_l0.zero_()
    x = RNG.normal(size=(T, B, insize)).astype(np.float32)
    y_jax = np.asarray(layer.apply(p, jnp.asarray(x)))
    y_ref, _ = ref(torch.tensor(x))
    np.testing.assert_allclose(y_jax, y_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("stride,winlen", [(1, 5), (2, 5), (5, 19), (3, 4)])
def test_convolution_matches_torch(stride, winlen):
    torch, nn = torch_mods()
    insize, size, T, B = 3, 7, 40, 2
    layer = layers.Convolution(insize, size, winlen, stride=stride,
                               fun=activation.linear)
    p = layer.init(RNG)
    conv = nn.Conv1d(insize, size, winlen, stride=stride)
    pad = nn.ConstantPad1d((winlen // 2, (winlen - 1) // 2), 0)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(np.asarray(p["W"])))
        conv.bias.copy_(torch.tensor(np.asarray(p["b"])))
    x = RNG.normal(size=(T, B, insize)).astype(np.float32)
    y_jax = np.asarray(layer.apply(p, jnp.asarray(x)))
    xt = torch.tensor(x).permute(1, 2, 0)          # BFT
    y_ref = conv(pad(xt)).permute(2, 0, 1).detach().numpy()
    assert y_jax.shape == y_ref.shape
    np.testing.assert_allclose(y_jax, y_ref, rtol=1e-4, atol=1e-5)


# -- heads and models --------------------------------------------------------

def test_global_norm_flipflop_head():
    head = layers.GlobalNormFlipFlop(8, 4)
    p = head.init(RNG)
    y = head.apply(p, rand_input())
    assert y.shape == (12, 3, 40)
    assert np.all(np.abs(np.asarray(y)) <= 5.0)
    j = head.json(p)
    assert j["type"] == "GlobalNormTwoState"
    json.dumps(j, cls=JsonEncoder)


def test_cat_mod_head():
    ai = AlphabetInfo("ACGTZY", "ACGTCA", ["5mC", "6mA"], do_reorder=True)
    head = layers.GlobalNormFlipFlopCatMod(8, ai)
    p = head.init(RNG)
    y = head.apply(p, rand_input())
    # 40 trans + ncan(4) + nmod(2)
    assert y.shape == (12, 3, 46)
    mods = np.exp(np.asarray(y[..., 40:]))
    # grouped softmax: groups (A, 6mA), (C, 5mC), (G,), (T,) each sum to 1
    np.testing.assert_allclose(mods[..., [0, 1]].sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(mods[..., [2, 3]].sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(mods[..., 4], 1.0, rtol=1e-5)
    np.testing.assert_allclose(mods[..., 5], 1.0, rtol=1e-5)
    j = head.json(p)
    assert j["type"] == "GlobalNormTwoStateCatMod"
    assert j["output_alphabet"] == "AYCZGT"
    json.dumps(j, cls=JsonEncoder)


def test_model_zoo_shapes_and_stride():
    from taiyaki_tpu.models import mGru_flipflop, mLstm_flipflop
    for factory, stride in [(mGru_flipflop.network, 2),
                            (mLstm_flipflop.network, 5)]:
        net = factory(size=16, stride=stride)
        p = net.init(RNG)
        assert net.stride == stride
        x = jnp.zeros((40, 2, 1))
        y = net.apply(p, x)
        assert y.shape == (40 // stride, 2, 40)
        assert layers.guess_model_stride(net, p, input_length=720) == stride
        json.dumps(net.json(p), cls=JsonEncoder)


def test_is_cat_mod_and_delta_predicates():
    from taiyaki_tpu.models import mGru_flipflop, mGru_cat_mod_flipflop
    net = mGru_flipflop.network(size=16)
    assert not layers.is_cat_mod_model(net)
    assert not layers.is_delta_model(net)
    ai = AlphabetInfo("ACGTZ", "ACGTC", ["5mC"], do_reorder=True)
    netm = mGru_cat_mod_flipflop.network(size=16, alphabet_info=ai)
    assert layers.is_cat_mod_model(netm)


def test_cudnn_gru_matches_torch():
    torch, nn = torch_mods()
    insize, size, T, B = 6, 10, 12, 3
    layer = layers.CudnnGru(insize, size)
    p = layer.init(RNG)
    ref = nn.GRU(insize, size)
    with torch.no_grad():
        ref.weight_ih_l0.copy_(torch.tensor(np.asarray(p["iW"])))
        ref.weight_hh_l0.copy_(torch.tensor(np.asarray(p["sW"])))
        ref.bias_ih_l0.copy_(torch.tensor(np.asarray(p["ib"])))
        ref.bias_hh_l0.copy_(torch.tensor(np.asarray(p["sb"])))
    x = RNG.normal(size=(T, B, insize)).astype(np.float32)
    y_jax = np.asarray(layer.apply(p, jnp.asarray(x)))
    y_ref, _ = ref(torch.tensor(x))
    np.testing.assert_allclose(y_jax, y_ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    j = layer.json(p)
    assert j["type"] == "CudnnGru"
    assert set(j["params"]) == {"iW", "sW", "ib", "sb"}


def test_misc_layer_json_schemas():
    x = rand_input()
    for layer, expected_type in [
            (layers.Identity(activation.tanh), "Identity"),
            (layers.Studentise(), "studentise"),
            (layers.DeltaSample(), "DeltaSample"),
            (layers.Window(3), "window"),
            (layers.UpSample(2), "UpSample"),
            (layers.DownSample(2), "DownSample"),
            (layers.TimeLinear(12, 6), "TimeLinear"),
    ]:
        p = layer.init(RNG)
        layer.apply(p, x)
        j = layer.json(p)
        assert j["type"] == expected_type
        json.dumps(j, cls=JsonEncoder)


def test_downupsample_wrapper():
    inner = layers.FeedForward(16, 16)
    wrapped = layers.DownUpSample(inner, 2)
    p = wrapped.init(RNG)
    y = wrapped.apply(p, rand_input())
    assert y.shape == (12, 3, 8)


def test_has_bias_false_biases_not_trained():
    """has_bias=False: bias leaves stay zero and receive NO gradient
    ("initialised to zero and not trained", reference layers.py:271-272;
    nn.LSTM/GRU(bias=False) have no bias at all)."""
    x = rand_input()  # [T, B, 8]
    for layer, bias_keys in [
            (layers.Lstm(8, 8, has_bias=False), ["b"]),
            (layers.GruMod(8, 8, has_bias=False), ["b"]),
            (layers.CudnnGru(8, 8, has_bias=False), ["ib", "sb"]),
    ]:
        p = layer.init(RNG)
        for k in bias_keys:
            assert not np.any(np.asarray(p[k])), k

        g = jax.grad(lambda pp: float(0) + jnp.sum(
            layer.apply(pp, x) ** 2))(jax.tree.map(jnp.asarray, p))
        for k in bias_keys:
            assert not np.any(np.asarray(g[k])), (type(layer).__name__, k)
        # the weights still train
        assert np.any(np.asarray(g["iW"]))


def test_parallel_stride_aggregation():
    """Parallel/Product/SoftChoice report their branches' common stride
    (previously inherited Layer.stride = 1 regardless)."""
    conv = lambda: layers.Convolution(8, 8, winlen=5, stride=2)
    for combi in (layers.Parallel, layers.Product, layers.SoftChoice):
        net = combi([conv(), conv()])
        assert net.stride == 2
    mixed = layers.Parallel([conv(), layers.FeedForward(8, 8)])
    import pytest
    with pytest.raises(AssertionError):
        mixed.stride
