"""Pallas kernels under mesh sharding (interpret mode on the 8-device
CPU mesh).

The mesh parity tests in test_train.py necessarily run the lax.scan
fallback (the Pallas path is TPU-gated), and the single real TPU chip
only ever exercises Pallas on a trivial 1-device mesh.  Whether
`pallas_call` partitions correctly inside the GSPMD-sharded jit at n>1
devices is exactly the gap this file closes: with
TAIYAKI_TPU_PALLAS_INTERPRET=1 the full dispatch stack (fused RNN
kernels, fused CRF selection/scatter, Pallas logZ) takes the Pallas
path off-TPU, and the whole sharded train step must reproduce the
single-device trajectory.

Covers SURVEY §4 item 4 (simulated multi-device CI) for the kernel
path; reference counterpart: workflow/test_multiGPU.sh exercises the
CUDA kernels under torch DDP.
"""

import numpy as np
import pytest
import jax

from taiyaki_tpu import train
from taiyaki_tpu.alphabet import AlphabetInfo
from taiyaki_tpu.data import chunk_selection
from taiyaki_tpu.models import mGru_flipflop, mLstm_flipflop
from taiyaki_tpu.ops import flipflop as flipflop_ops
from taiyaki_tpu.ops import rnn as rnn_ops

from test_train import synth_reads


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(4242)
    reads = synth_reads(rng, nreads=4, nbases=200)
    ai = AlphabetInfo("ACGT", "ACGT")
    fp = chunk_selection.FILTER_PARAMETERS(
        filter_mean_dwell=10.0, filter_max_dwell=20.0,
        filter_min_pass_fraction=0.1, median_meandwell=8.0,
        mad_meandwell=3.0, model_stride=2, path_buffer=1.1)
    return reads, ai, fp


def run_trajectory(setup, net, params, mesh, niter=3, seed=99):
    reads, ai, fp = setup
    chunk_len, batch_size = 256, 8
    max_seqlen = train.max_seqlen_for_chunk(chunk_len, 2, 1.1)
    opt, _ = train.make_optimizer(
        lr_max=4e-3, niteration=niter, warmup_batches=1, lr_warmup=1e-4,
        lr_min=1e-4)
    opt_state = opt.init(params)
    step = train.jit_train_step(
        train.make_train_step(net, opt), mesh=mesh)
    nleaves = len(jax.tree.leaves(params))
    capper = train.GradientCapper(nleaves, n_mads=2, window=4)
    np.random.seed(seed)
    losses = []
    for _ in range(niter):
        batch, _ = train.sample_batch(
            reads, chunk_len, batch_size, max_seqlen, ai, fp)
        if mesh is not None:
            batch = train.shard_batch(batch, mesh)
        params, opt_state, loss, grad_maxs = step(
            params, opt_state, batch, 1.0, 1.0,
            jax.numpy.asarray(capper.thresholds))
        capper.update(np.asarray(grad_maxs))
        losses.append(float(loss))
    return losses


@pytest.mark.parametrize("model", ["gru", "lstm"])
def test_pallas_train_step_parity_on_mesh(setup, model, monkeypatch):
    """Pallas-path sharded trajectory == Pallas-path single-device
    trajectory == scan-path sharded trajectory (same data order)."""
    monkeypatch.setenv("TAIYAKI_TPU_PALLAS_INTERPRET", "1")
    # the force-flag must actually engage the kernel path off-TPU
    assert rnn_ops._use_pallas(8) and flipflop_ops._use_pallas()

    mod = mGru_flipflop if model == "gru" else mLstm_flipflop
    net = mod.network(size=12, winlen=9, stride=2)
    params = net.init(np.random.default_rng(4242))

    devices = jax.devices()
    assert len(devices) == 8, "conftest should provide 8 CPU devices"
    mesh = jax.sharding.Mesh(np.array(devices), ("data",))

    sharded = run_trajectory(setup, net, params, mesh)
    single = run_trajectory(setup, net, params, None)
    assert np.isfinite(sharded).all() and np.isfinite(single).all()
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=1e-6)

    # and the kernel path agrees with the scan path under the same mesh.
    # Per-step kernel-vs-scan parity is pinned tightly elsewhere
    # (test_pallas_rnn/crf/logz); across optimizer steps the benign
    # reduction-order differences compound, so the trajectory bound is
    # looser (observed drift ~1e-3 relative by step 3).
    monkeypatch.delenv("TAIYAKI_TPU_PALLAS_INTERPRET")
    assert not rnn_ops._use_pallas(8)
    scan_sharded = run_trajectory(setup, net, params, mesh)
    np.testing.assert_allclose(sharded, scan_sharded, rtol=5e-3, atol=1e-5)
