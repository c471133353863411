#!/usr/bin/env python3
"""Does the trainer's per-iteration loss/grad_maxs fetch serialize on
the device->host link?

bench.py's tracked number chains >=20 steps and fetches once (an honest
barrier for remote-execution runtimes).  The real trainer
(bin/train_flipflop.py) instead calls float(loss) +
np.asarray(grad_maxs) EVERY iteration — two synchronous RPCs on a link
with a measured per-call floor.  This probe times three loop shapes at
the production config (mLstm256, chunk 4000, bs256):

  chained    N steps dispatched back-to-back, one final fetch — the
             bench methodology (device-bound ceiling)
  sync       float(loss) + np.asarray(grad_maxs) every step — the
             shipped trainer's loop shape
  pipelined  fetch step k-1's values after dispatching step k (one-step
             delay, what a pipelined trainer achieves; the gradient
             capper's rolling-MAD update lags one step — statistically
             immaterial for a 1000-sample window)

If sync >> chained and pipelined ~= chained, the trainer should adopt
the pipelined shape.

Usage: python misc/fetch_overlap_probe.py [--batch 256] [--steps 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=4000)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from taiyaki_tpu import train
    from taiyaki_tpu.models import mLstm_flipflop
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ab_train_variants import make_batch

    net = mLstm_flipflop.network(size=256, stride=5, winlen=19)
    params = jax.device_put(net.init(np.random.default_rng(0)))
    opt, _ = train.make_optimizer(lr_max=4e-3, niteration=1000,
                                  warmup_batches=10, lr_warmup=1e-4,
                                  lr_min=1e-4)
    opt_state = jax.device_put(opt.init(params))
    batch = make_batch(train, np.random.default_rng(0), args.chunk, 5,
                       args.batch)
    batch = train.Batch(*[jax.device_put(a) if a is not None else None
                          for a in batch])
    step_fn = train.jit_train_step(
        train.make_train_step(net, opt), mesh=None)
    nleaves = len(jax.tree.leaves(params))
    threshs = jnp.full(nleaves, jnp.inf, jnp.float32)

    def warm():
        nonlocal params, opt_state
        params, opt_state, loss, gm = step_fn(params, opt_state, batch,
                                              1.0, 1.0, threshs)
        return float(loss)

    warm()

    def run(mode, ring=8):
        nonlocal params, opt_state
        best = np.inf
        for _ in range(args.windows):
            t0 = time.perf_counter()
            pending = None
            backlog = []
            for _ in range(args.steps):
                params, opt_state, loss, gm = step_fn(
                    params, opt_state, batch, 1.0, 1.0, threshs)
                if mode == "sync":
                    float(loss)
                    np.asarray(gm)
                elif mode == "pipelined":
                    if pending is not None:
                        float(pending[0])
                        np.asarray(pending[1])
                    pending = (loss, gm)
                elif mode == "pipelined1":
                    # one-step delay, ONE transfer call for both values
                    if pending is not None:
                        jax.device_get(pending)
                    pending = (loss, gm)
                elif mode == "ring":
                    # fetch the whole backlog in one call every `ring` steps
                    backlog.append((loss, gm))
                    if len(backlog) >= ring:
                        jax.device_get(backlog)
                        backlog = []
            if pending is not None:
                jax.device_get(pending)
            if backlog:
                jax.device_get(backlog)
            float(loss)          # barrier for chained mode
            best = min(best, (time.perf_counter() - t0) / args.steps)
        print("%-10s %7.2f ms/step  (%.0f chunks/s)"
              % (mode, best * 1e3, args.batch / best), flush=True)
        return best

    t_chain = run("chained")
    t_sync = run("sync")
    t_pipe = run("pipelined")
    t_pipe1 = run("pipelined1")
    t_ring = run("ring")
    print("overhead vs chained:  sync +%.1f%%  pipelined +%.1f%%  "
          "pipelined1 +%.1f%%  ring8 +%.1f%%"
          % (100 * (t_sync / t_chain - 1), 100 * (t_pipe / t_chain - 1),
             100 * (t_pipe1 / t_chain - 1), 100 * (t_ring / t_chain - 1)))


if __name__ == "__main__":
    main()
