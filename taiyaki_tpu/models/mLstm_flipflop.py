"""3-conv stack + 5x alternating-direction LSTM + flip-flop head — the
Guppy production architecture (reference: models/mLstm_flipflop.py:6-20)."""

from taiyaki_tpu import activation, layers


def network(insize=1, size=256, winlen=19, stride=5, alphabet_info=None):
    nbase = 4 if alphabet_info is None else alphabet_info.nbase
    winlen2 = 5
    return layers.Serial([
        layers.Convolution(insize, 4, winlen2, stride=1,
                           fun=activation.swish),
        layers.Convolution(4, 16, winlen2, stride=1, fun=activation.swish),
        layers.Convolution(16, size, winlen, stride=stride,
                           fun=activation.swish),
        layers.Reverse(layers.Lstm(size, size)),
        layers.Lstm(size, size),
        layers.Reverse(layers.Lstm(size, size)),
        layers.Lstm(size, size),
        layers.Reverse(layers.Lstm(size, size)),
        layers.GlobalNormFlipFlop(size, nbase),
    ])
