"""cat_mod Pallas kernels under mesh sharding (interpret mode, 8-device
CPU mesh).

Companion to test_pallas_mesh.py, which covers the canonical gru/lstm
paths: the cat_mod fused CRF kernel has its own selector build (weighted
mod columns folded into the move selectors), its own VMEM tile budget
(bb=32 at S=45 vs bb=64 at S=40 — see ops/pallas_crf.py), and its own
numerics class, so its partitioning under the GSPMD-sharded jit is
pinned separately here.  Reference counterpart: the cat_mod CUDA/C
kernels under torch DDP (taiyaki/ctc/c_cat_mod_flipflop.c +
workflow/test_multiGPU.sh).
"""

import numpy as np
import pytest
import jax

from taiyaki_tpu import train
from taiyaki_tpu.alphabet import AlphabetInfo
from taiyaki_tpu.data import chunk_selection
from taiyaki_tpu.data.signal_mapping import SignalMapping
from taiyaki_tpu.models import mGru_cat_mod_flipflop, mLstm_cat_mod_flipflop
from taiyaki_tpu.ops import flipflop as flipflop_ops
from taiyaki_tpu.ops import rnn as rnn_ops


def synth_mod_reads(rng, nreads=4, nbases=200, mean_dwell=8):
    """Synthetic mod-base reads: alphabet ACGTZ with Z a mod of A
    (collapse ACGTA), square-wave signal per canonical base."""
    reads = []
    levels = np.array([-1.0, -0.3, 0.4, 1.1, -1.0])  # Z levels like A
    for i in range(nreads):
        reference = rng.integers(0, 4, size=nbases).astype(np.int16)
        # flip ~20% of the A's (code 0) to Z (code 4)
        is_a = reference == 0
        flip = rng.random(nbases) < 0.2
        reference[is_a & flip] = 4
        dwells = np.maximum(2, rng.poisson(mean_dwell, size=nbases))
        ref_to_sig = np.concatenate([[0], np.cumsum(dwells)]).astype(np.int32)
        siglen = int(ref_to_sig[-1])
        current = np.repeat(levels[reference], dwells)
        current = current + rng.normal(0, 0.15, size=siglen)
        dacs = np.clip(current * 1000, -32000, 32000).astype(np.int16)
        reads.append(SignalMapping(
            ref_to_sig, reference, read_id="synthmod-{}".format(i),
            Dacs=dacs, shift_frompA=0.0, scale_frompA=1000.0, range=1.0,
            offset=0.0, digitisation=1.0))
    return reads


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(2424)
    reads = synth_mod_reads(rng)
    ai = AlphabetInfo("ACGTZ", "ACGTA", mod_long_names=["5mZ"])
    fp = chunk_selection.FILTER_PARAMETERS(
        filter_mean_dwell=10.0, filter_max_dwell=20.0,
        filter_min_pass_fraction=0.1, median_meandwell=8.0,
        mad_meandwell=3.0, model_stride=2, path_buffer=1.1)
    return reads, ai, fp


def run_trajectory(setup, net, params, mesh, head, niter=3, seed=77):
    reads, ai, fp = setup
    chunk_len, batch_size = 256, 8
    max_seqlen = train.max_seqlen_for_chunk(chunk_len, 2, 1.1)
    opt, _ = train.make_optimizer(
        lr_max=4e-3, niteration=niter, warmup_batches=1, lr_warmup=1e-4,
        lr_min=1e-4)
    opt_state = opt.init(params)
    mod_cat_weights = np.ones(head.ncan_base + head.nmod_base,
                              dtype=np.float32)
    step = train.jit_train_step(
        train.make_train_step(net, opt, is_cat_mod=True,
                              can_mods_offsets=head.can_mods_offsets,
                              mod_cat_weights=mod_cat_weights), mesh=mesh)
    nleaves = len(jax.tree.leaves(params))
    capper = train.GradientCapper(nleaves, n_mads=2, window=4)
    np.random.seed(seed)
    losses = []
    for _ in range(niter):
        batch, _ = train.sample_batch(
            reads, chunk_len, batch_size, max_seqlen, ai, fp,
            can_labels=head.can_labels, mod_labels=head.mod_labels)
        if mesh is not None:
            batch = train.shard_batch(batch, mesh)
        params, opt_state, loss, grad_maxs = step(
            params, opt_state, batch, 1.0, 1.0,
            jax.numpy.asarray(capper.thresholds))
        capper.update(np.asarray(grad_maxs))
        losses.append(float(loss))
    return losses


@pytest.mark.parametrize("model", ["gru", "lstm"])
def test_cat_mod_pallas_train_step_parity_on_mesh(setup, model, monkeypatch):
    """cat_mod Pallas sharded trajectory == single-device trajectory ==
    scan-path sharded trajectory (same data order)."""
    monkeypatch.setenv("TAIYAKI_TPU_PALLAS_INTERPRET", "1")
    assert rnn_ops._use_pallas(8) and flipflop_ops._use_pallas()

    _, ai, _ = setup
    mod = (mGru_cat_mod_flipflop if model == "gru"
           else mLstm_cat_mod_flipflop)
    net = mod.network(size=12, winlen=9, stride=2, alphabet_info=ai)
    head = net.sublayers[-1]
    params = net.init(np.random.default_rng(2424))

    devices = jax.devices()
    assert len(devices) == 8, "conftest should provide 8 CPU devices"
    mesh = jax.sharding.Mesh(np.array(devices), ("data",))

    sharded = run_trajectory(setup, net, params, mesh, head)
    single = run_trajectory(setup, net, params, None, head)
    assert np.isfinite(sharded).all() and np.isfinite(single).all()
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=1e-6)

    # kernel path vs scan path under the same mesh (looser: benign
    # reduction-order drift compounds across steps, and the cat_mod
    # selector scratch rounds mod weights to bf16 — see
    # test_pallas_crf.py::test_crf_fused_cat_mod_selectors)
    monkeypatch.delenv("TAIYAKI_TPU_PALLAS_INTERPRET")
    assert not rnn_ops._use_pallas(8)
    scan_sharded = run_trajectory(setup, net, params, mesh, head)
    np.testing.assert_allclose(sharded, scan_sharded, rtol=2e-2, atol=1e-4)
