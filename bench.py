#!/usr/bin/env python
"""Benchmark: superover parameter sweep on one TPU chip.

Workload (BASELINE.md): the 'Der Super Over' overdrive at 44.1 kHz with a
per-lane parameter axis -- either L independent channels at graded input
levels through one pedal (--sweep level), or a drive x tone pot grid
(--sweep pots) -- run by the fused Pallas kernel (float32 fast path with
compensated-residual polish; float64 parity is covered by tests/ and the
scan engine).  Metric: real-time factor per lane; target >= 100x.

Timing methodology: the TPU here sits behind an asynchronous tunnel whose
``block_until_ready`` returns before execution finishes, so single-run
timings are fiction.  We time N chained runs ending with a forced
device-to-host fetch and report the amortized per-run cost (run-1 measured
this wrong and over-reported ~80x).

Parity vs the float64 host reference on the power-up run (the hardest
stretch: the supply-rail transient) is reported by default.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
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
    ap.add_argument("--seconds", type=float, default=1.0,
                    help="audio seconds per timed run")
    ap.add_argument("--fs", type=int, default=44100)
    ap.add_argument("--newton-iters", type=int, default=192)
    ap.add_argument("--reps", type=int, default=5,
                    help="chained timed runs (amortized)")
    ap.add_argument("--engine", choices=["fused", "scan"], default="fused")
    ap.add_argument("--sweep", choices=["level", "pots"], default="level",
                    help="lane axis: per-lane input level (L channels "
                         "through one pedal) or drive x tone pot grid "
                         "(pots-as-inputs model; harder for float32)")
    ap.add_argument("--group-lanes", type=int, default=2048,
                    help="lanes per independent kernel grid group "
                         "(default matches FusedRunner's)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-safe smoke run")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the float64 host parity check")
    args = ap.parse_args()

    if args.smoke:
        # CPU sanity path: the float64 scan engine compiles quickly on CPU;
        # interpret-mode Pallas would take minutes for the nn=7 kernel
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        args.lanes = 16
        args.seconds = min(args.seconds, 0.005)
        args.engine = "scan"
        args.sweep = "pots"
        args.reps = 1

    import numpy as np
    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from acme_tpu.models import superover_model

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    if args.sweep == "pots":
        model = superover_model(drive=None, tone=None, level=1.0, fs=args.fs)
    else:
        model = superover_model(drive=1.0, tone=1.0, level=1.0, fs=args.fs)
    log(f"model build: {time.time()-t0:.1f}s  "
        f"np={[model.np(i) for i in range(model.nsubsystems)]} "
        f"nn={[model.nn(i) for i in range(model.nsubsystems)]} nx={model.nx}")

    T = max(16, int(round(args.seconds * args.fs)))
    L = args.lanes
    u_time = (0.2 * np.sin(2 * np.pi * 1000 / args.fs * np.arange(T)))[None, :]
    if args.sweep == "pots":
        # drive x tone grid over 5%..95% pot travel (the exact end stops
        # are singular operating points; the reference warns there too)
        a = max(1, int(np.sqrt(L)))
        while L % a:
            a -= 1
        b = L // a
        drive = np.repeat(np.linspace(0.05, 0.95, a), b)
        tone = np.tile(np.linspace(0.05, 0.95, b), a)
        lane_values = np.stack([drive, tone], axis=1)
        lane_cfg = dict(lane_input_idx=(1, 2))
    else:
        # L independent channels through one pedal at graded input levels
        levels = np.linspace(0.1, 2.0, L)
        lane_values = levels[:, None]
        lane_cfg = dict(lane_scale_idx=(0,))
        drive = tone = None

    extras = {}
    if args.engine == "fused":
        from acme_tpu.ops.fused import FusedRunner
        t0 = time.time()
        fr = FusedRunner(model, newton_iters=args.newton_iters, tol=1e-9,
                         group_lanes=args.group_lanes, interpret=args.smoke,
                         **lane_cfg)
        log(f"runner build (centering + floors): {time.time()-t0:.1f}s")
        t0 = time.time()
        y0, state, info0 = fr.run(u_time, lane_values)
        _ = np.asarray(y0[:1, :1, :8])  # sync: true completion (tiny fetch)
        f0 = np.asarray(info0.fails)
        log(f"compile+power-up run: {time.time()-t0:.1f}s  "
            f"fails/lane mean {f0.mean():.1f} max {int(f0.max())} of {T}")
        t0 = time.time()
        for _ in range(args.reps):
            y, state, info = fr.run(u_time, lane_values, state=state)
        _ = np.asarray(y[:1, :1, :8])  # sync
        wall = (time.time() - t0) / args.reps
        fails = np.asarray(info.fails)
        iters = np.asarray(info.iters).sum(1)
        extras["fails_mean"] = round(float(fails.mean()), 2)
        extras["fails_max"] = int(fails.max())
        extras["powerup_fails_mean"] = round(float(f0.mean()), 2)
        extras["iters_per_sample_mean"] = round(float(iters.mean()) / T, 2)
    else:
        if args.sweep != "pots":
            raise SystemExit("--engine scan supports --sweep pots only")
        from acme_tpu.engine import compile_model
        cm = compile_model(model)
        t0 = time.time()
        y0, state, info = cm.run_sweep(u_time, lane_values, (1, 2))
        _ = np.asarray(y0[:1, :1, :8])
        log(f"compile+power-up run: {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(args.reps):
            y, state, info = cm.run_sweep(u_time, lane_values, (1, 2),
                                          state=state)
        _ = np.asarray(y[:1, :1, :8])
        wall = (time.time() - t0) / args.reps
        extras["fails_mean"] = 0.0

    audio_s = T / args.fs
    rt_per_lane = audio_s / wall
    log(f"timed: {wall*1e3:.1f} ms/run for {audio_s:.3f}s audio x {L} lanes "
        f"({args.reps} chained reps)")
    log(f"RT-factor per lane: {rt_per_lane:.2f}x   "
        f"aggregate: {rt_per_lane*L:.0f}x realtime   "
        f"({rt_per_lane*L*args.fs/1e6:.1f} Msamples/s)")

    if not args.no_parity:
        # parity vs the float64 host on the power-up run (hardest stretch:
        # the supply-rail transient) AND on the steady-state run, for the
        # middle and extreme lanes
        import acme_tpu as A
        Tp = min(T, 4410)
        dbs, dbs_st = [], []
        for i in (L // 2, L - 1):
            if args.sweep == "pots":
                mh = superover_model(drive=None, tone=None, level=1.0,
                                     fs=args.fs)
                uh = np.vstack([u_time, np.full((1, T), drive[i]),
                                np.full((1, T), tone[i])])
            else:
                mh = superover_model(drive=1.0, tone=1.0, level=1.0,
                                     fs=args.fs)
                uh = u_time * lane_values[i, 0]
            yh = A.run(mh, uh)          # power-up window
            yh_st = A.run(mh, uh)       # chained: steady window
            ref = max(float(np.max(np.abs(yh_st))), 1e-12)
            y0i = np.asarray(y0[i, 0, :Tp])  # fetch just this lane's window
            db = 20 * np.log10(
                float(np.max(np.abs(y0i - yh[0, :Tp]))) / ref + 1e-300)
            dbs.append(db)
            # the timed loop ran `reps` chained windows after power-up;
            # chain the host the same number of times for the comparison
            for _ in range(args.reps - 1):
                yh_st = A.run(mh, uh)
            yi = np.asarray(y[i, 0, :])
            db_st = 20 * np.log10(
                float(np.max(np.abs(yi - yh_st[0]))) / ref + 1e-300)
            dbs_st.append(db_st)
            log(f"parity lane {i} vs float64 host: power-up {db:.1f} dB, "
                f"steady {db_st:.1f} dB")
        extras["parity_db"] = round(max(dbs), 1)
        extras["parity_steady_db"] = round(max(dbs_st), 1)

    print(json.dumps({
        "metric": "superover RT-factor per lane @44.1kHz, "
                  f"{L} lanes ({'drive x tone grid' if args.sweep == 'pots' else 'input-level sweep'}), "
                  f"{'fused float32 kernel' if args.engine == 'fused' else 'float64 scan engine'}",
        "value": round(rt_per_lane, 3),
        "unit": "x realtime per lane",
        "vs_baseline": round(rt_per_lane / 100.0, 4),
        **extras,
    }))


if __name__ == "__main__":
    main()
