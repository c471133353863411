"""Model zoo: network description factories.

Each module exposes `network(insize, size, winlen, stride, alphabet_info)`
returning a `layers.Serial` — the same factory convention as the
reference's models/*.py files, which are loaded dynamically by the
training scripts.
"""
