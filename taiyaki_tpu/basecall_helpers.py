"""Chunking and stitching for basecalling arbitrarily long reads
(reference: taiyaki/basecall_helpers.py).

Long reads are split into fixed-size overlapping chunks (batched onto the
accelerator) and the per-chunk outputs (or Viterbi paths) are stitched back
together at chunk midpoints in block (post-stride) coordinates.
"""

import numpy as np

DEFAULT_CHUNK_SIZE = 1000
DEFAULT_OVERLAP = 100


def chunk_read(signal, chunk_size, overlap):
    """Split a signal into overlapping chunks.

    Returns:
        (chunks [chunk_size, nchunks, 1] f32, chunk_starts, chunk_ends).
        A signal shorter than chunk_size yields one untrimmed chunk.
    """
    signal = np.asarray(signal)
    if len(signal) < chunk_size:
        return (signal.astype(np.float32)[:, None, None],
                np.array([0]), np.array([len(signal)]))
    chunk_ends = np.arange(chunk_size, len(signal), chunk_size - overlap,
                           dtype=int)
    chunk_ends = np.concatenate([chunk_ends, [len(signal)]])
    chunk_starts = chunk_ends - chunk_size
    nchunks = len(chunk_ends)
    chunks = np.empty((chunk_size, nchunks, 1), dtype=np.float32)
    for i, (start, end) in enumerate(zip(chunk_starts, chunk_ends)):
        chunks[:, i, 0] = signal[start:end]
    return chunks, chunk_starts, chunk_ends


def stitch_chunks(out, chunk_starts, chunk_ends, stride,
                  path_stitching=False):
    """Stitch per-chunk network output (or paths) at chunk midpoints.

    Args:
        out: [nblocks, nchunks, ...] array (network output) or
            [nblocks + 1, nchunks] (Viterbi paths, with path_stitching=True).
        chunk_starts/chunk_ends: signal coordinates of each chunk.
        stride: model stride (signal samples per output block).
        path_stitching: offset splits by one to account for paths having
            nblocks + 1 entries.

    Returns:
        [total_blocks, ...] stitched array.
    """
    out = np.asarray(out)
    nchunks = out.shape[1]
    if nchunks == 1:
        return out[:, 0]
    pieces = []
    # first chunk: from its start to the midpoint with the next chunk
    start = chunk_starts[0] // stride
    end = (chunk_ends[0] + chunk_starts[1]) // (2 * stride)
    if path_stitching:
        end += 1
    pieces.append(out[start:end, 0])
    for i in range(1, nchunks - 1):
        start = (chunk_ends[i - 1] - chunk_starts[i]) // (2 * stride)
        end = (chunk_ends[i] + chunk_starts[i + 1]
               - 2 * chunk_starts[i]) // (2 * stride)
        if path_stitching:
            start += 1
            end += 1
        pieces.append(out[start:end, i])
    start = (chunk_ends[-2] - chunk_starts[-1]) // (2 * stride)
    end = (chunk_ends[-1] - chunk_starts[-1]) // stride
    if path_stitching:
        start += 1
        end += 1
    pieces.append(out[start:end, -1])
    return np.concatenate(pieces, axis=0)


def run_model(normed_signal, net, params, chunk_size=DEFAULT_CHUNK_SIZE,
              overlap=DEFAULT_OVERLAP, max_concur_chunks=None,
              apply_fn=None):
    """Chunk a read, run the network, stitch outputs (megalodon hook).

    chunk_size and overlap are in *blocks* (multiples of model stride),
    matching Guppy's parameterisation (reference: basecall_helpers.py:97).

    Args:
        apply_fn: optional pre-jitted fn(params, chunks) -> output; defaults
            to net.apply.
    """
    import jax.numpy as jnp
    stride = net.stride
    chunks, chunk_starts, chunk_ends = chunk_read(
        normed_signal, chunk_size * stride, overlap * stride)
    fn = apply_fn if apply_fn is not None else net.apply
    if max_concur_chunks is None:
        out = np.asarray(fn(params, jnp.asarray(chunks)))
    else:
        outs = []
        for i in range(0, chunks.shape[1], max_concur_chunks):
            outs.append(np.asarray(
                fn(params, jnp.asarray(chunks[:, i:i + max_concur_chunks]))))
        out = np.concatenate(outs, axis=1)
    return stitch_chunks(out, chunk_starts, chunk_ends, stride)
