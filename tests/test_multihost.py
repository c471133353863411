"""Multi-host data-parallel training smoke test.

Launches TWO real processes that rendezvous through
jax.distributed.initialize and train together over a global 4-device mesh
(2 virtual CPU devices per process).  This goes beyond the reference,
whose 2-GPU test needs real hardware and is excluded from CI
(workflow/test_multiGPU.sh; README "We can't run this test on the git
server because it needs GPUs").
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_MSF = ("/root/reference/test/data/mapped_signal_file/"
               "mapped_reads_0.hdf5")

needs_fixtures = pytest.mark.skipif(not os.path.exists(FIXTURE_MSF),
                                    reason="reference fixtures absent")

def _free_port():
    """Ephemeral rendezvous port: a fixed one collides when two suites
    run concurrently on one machine."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


PORT = _free_port()


def launch(proc_id, outdir):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        TAIYAKI_COORDINATOR="localhost:{}".format(PORT),
        TAIYAKI_NUM_PROCS="2",
        TAIYAKI_PROC_ID=str(proc_id),
    )
    # each process must have its own compile cache dir or they race
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    # --seqlen_buckets (explicit): multihost bucketing syncs the
    # data-dependent bucket via the coordination-service KV store
    # (_seqlen_sync); hosts disagreeing on padded shapes would crash or
    # deadlock the psum, so this test completing IS the shape-agreement
    # assertion.
    args = [sys.executable,
            os.path.join(REPO, "bin", "train_flipflop.py"),
            "--device", "cpu", "--multihost", "--seqlen_buckets",
            "--size", "16", "--stride", "2", "--winlen", "9",
            "--niteration", "3", "--warmup_batches", "1",
            "--chunk_len_min", "300", "--chunk_len_max", "400",
            "--min_sub_batch_size", "8", "--save_every", "2",
            "--sample_nreads_before_filtering", "50",
            "--reporting_sub_batches", "10", "--seed", "13",
            "--outdir", outdir,
            os.path.join(REPO, "taiyaki_tpu", "models",
                         "mGru_flipflop.py"),
            FIXTURE_MSF]
    return subprocess.Popen(args, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


@needs_fixtures
def test_two_process_training(tmp_path):
    out0 = str(tmp_path / "lead")
    out1 = str(tmp_path / "follower")
    p0 = launch(0, out0)
    p1 = launch(1, out1)
    log0 = p0.communicate(timeout=900)[0]
    log1 = p1.communicate(timeout=900)[0]
    assert p0.returncode == 0, log0[-3000:]
    assert p1.returncode == 0, log1[-3000:]

    # global mesh spanned both processes
    assert "Data-parallel over 4 devices on 2 hosts" in log0, log0[-3000:]

    # only the lead process writes logs and checkpoints
    assert os.path.exists(os.path.join(out0, "model_final.checkpoint"))
    assert not os.path.exists(os.path.join(out1, "model_final.checkpoint"))
    batch_log = open(os.path.join(out0, "batch.log")).read().splitlines()
    assert len(batch_log) == 4  # header + 3 iterations
    losses = [float(line.split("\t")[1]) for line in batch_log[1:]]
    assert all(l > 0 and l == l for l in losses)  # finite, positive
