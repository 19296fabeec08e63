#!/usr/bin/env python
"""Benchmark: superover drive x tone parameter sweep on one TPU chip.

Workload (BASELINE.md): the 'Der Super Over' overdrive at 44.1 kHz with
drive and tone pots as per-lane constant inputs -- a 64 x 64 = 4096-lane
parameter grid on a single chip.  Metric: real-time factor per lane
(audio-seconds simulated per wall-second, per lane); target >= 100x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--seconds", type=float, default=0.1,
                    help="audio seconds per timed run")
    ap.add_argument("--fs", type=int, default=44100)
    ap.add_argument("--dtype", choices=["float32", "float64"], default="float32")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-safe smoke run")
    ap.add_argument("--parity", action="store_true",
                    help="also report parity vs float64 host reference")
    args = ap.parse_args()

    if args.smoke:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        args.lanes = min(args.lanes, 8)
        args.seconds = min(args.seconds, 0.005)

    import numpy as np
    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from acme_tpu.engine import compile_model
    from acme_tpu.models import superover_model

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    model = superover_model(drive=None, tone=None, level=1.0, fs=args.fs)
    log(f"model build: {time.time()-t0:.1f}s  np={[model.np(i) for i in range(model.nsubsystems)]}"
        f" nn={[model.nn(i) for i in range(model.nsubsystems)]} nx={model.nx}")

    import jax.numpy as jnp
    dtype = jnp.float32 if args.dtype == "float32" else jnp.float64
    cm = compile_model(model, dtype=dtype)
    log(f"dtype={dtype.__name__} tol={cm.tol}")

    T = max(16, int(round(args.seconds * args.fs)))
    L = args.lanes
    # pot travel 5%..95%: exact end stops make the drive pot's wiper branch
    # degenerate (singular Jacobian) -- the reference warns there too
    side = int(round(L ** 0.5))
    drive = np.repeat(np.linspace(0.05, 0.95, side), L // side)[:L]
    tone = np.tile(np.linspace(0.05, 0.95, L // side), side)[:L]
    lane_values = np.stack([drive, tone], axis=1)
    u_time = (0.2 * np.sin(2 * np.pi * 1000 / args.fs * np.arange(T)))[None, :]

    # warm the pots/state gently before the timed region (the reference has a
    # comparable 'learning phase' while its solution cache warms,
    # README.md:122-125); also triggers compilation at the timed shapes
    t0 = time.time()
    y, state, info = cm.run_sweep(u_time, lane_values, (1, 2))
    jax.block_until_ready(y)
    log(f"compile+first run: {time.time()-t0:.1f}s  "
        f"converged={float(np.mean(np.asarray(info.converged))):.4f}  "
        f"iters/sample={float(np.mean(np.asarray(info.iters))):.2f}")

    t0 = time.time()
    y, state, info = cm.run_sweep(u_time, lane_values, (1, 2), state=state)
    jax.block_until_ready(y)
    wall = time.time() - t0
    audio_s = T / args.fs
    rt_per_lane = audio_s / wall
    log(f"timed run: {wall*1e3:.1f} ms for {audio_s:.3f}s audio x {L} lanes; "
        f"converged={float(np.mean(np.asarray(info.converged))):.4f} "
        f"iters/sample={float(np.mean(np.asarray(info.iters))):.2f}")
    log(f"RT-factor per lane: {rt_per_lane:.2f}x  "
        f"aggregate: {rt_per_lane*L:.0f}x realtime")

    if args.parity:
        import acme_tpu as A
        Tp = min(T, 2000)
        mh = superover_model(drive=None, tone=None, level=1.0, fs=args.fs)
        uh = np.vstack([u_time[:, :Tp],
                        np.full((1, Tp), drive[0]), np.full((1, Tp), tone[0])])
        yh = A.run(mh, uh)
        yj = np.asarray(y)[0, :, :Tp]
        # compare the first lane's fresh run
        y0, _, _ = cm.run_sweep(u_time[:, :Tp], lane_values[:1], (1, 2))
        err = float(np.max(np.abs(np.asarray(y0)[0] - yh)))
        db = 20 * np.log10(err / (np.max(np.abs(yh)) + 1e-300) + 1e-300)
        log(f"parity lane0 vs host float64: {db:.1f} dB")

    print(json.dumps({
        "metric": "superover RT-factor per lane @44.1kHz, "
                  f"{L} lanes (drive x tone grid), {args.dtype}",
        "value": round(rt_per_lane, 3),
        "unit": "x realtime per lane",
        "vs_baseline": round(rt_per_lane / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
