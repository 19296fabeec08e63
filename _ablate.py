#!/usr/bin/env python
"""Cost-anatomy ablations for the fused superover chain kernel.

One process: build the chain model once, power up once with the base
config, then for each candidate config build a FusedRunner and time
chained runs from the SAME powered-up state.  Accuracy is sanity-checked
against the base config's output (not the host oracle -- bench.py does
that); fails counts are reported.
"""
import sys
import time

import numpy as np

CONFIGS = {
    # name: FusedRunner overrides
    "base":        dict(),
    "df_off":      dict(df_polish=False),
    "nopivot":     dict(pivot=False),
    "fast2":       dict(fast_iters=2),
    "pol1":        dict(polish_iters=1),
    "tc512":       dict(time_chunk=512),
    "polonly":     dict(polish_only=True, fast_iters=0),
    "polfix1":     dict(polish_fixed=1),
    # candidate production configs (combined knobs)
    "fix2v":       dict(polish_fixed=2, verdict_refine=0,
                        verdict_jac="plain"),
    "fix1v":       dict(polish_fixed=1, verdict_refine=0,
                        verdict_jac="plain"),
    "minimal":     dict(polish_fixed=1, df_polish=False,
                        compensated=False),
    "vjplain":     dict(verdict_jac="plain"),
    "vref0":       dict(verdict_refine=0),
    "noextrap":    dict(extrapolate=False),
    "polfix2":     dict(polish_fixed=2),
    "polfix3":     dict(polish_fixed=3),
    "comp_off":    dict(compensated=False, df_polish=False),
    # round-4 verdict-tier candidates at the production prefix depth
    "cf2":         dict(polish_fixed=2, df_polish="comp_final"),
    "pf2":         dict(polish_fixed=2),
    # eval-count reduction candidates: shallower polish prefix and
    # polish-only (the warm start's first polish step IS the Newton step)
    "cf1":         dict(polish_fixed=1, df_polish="comp_final"),
    "co2":         dict(polish_only=True, fast_iters=0, polish_fixed=2,
                        df_polish="comp_final"),
    "co1":         dict(polish_only=True, fast_iters=0, polish_fixed=1,
                        df_polish="comp_final"),
}

def main():
    names = sys.argv[1:] or list(CONFIGS)
    # 'base' must run first: it is the accuracy reference for every other
    # config's vs-base dB column
    if "base" in names:
        names.remove("base")
    names.insert(0, "base")
    fs = 44100
    T = 44100
    L = 4096
    reps = 3

    from acme_tpu.models import superover_model
    from acme_tpu.ops.fused import FusedRunner

    t0 = time.time()
    model = superover_model(drive=1.0, tone=1.0, level=1.0, fs=fs,
                            vb_source=True)
    print(f"model build {time.time()-t0:.1f}s", flush=True)

    base_kw = dict(newton_iters=192, tol=1e-9, group_lanes=L,
                   fast_iters=1, df_polish="plain_final",
                   fast_verify="merge", powerup="safe")
    levels = np.linspace(0.1, 2.0, L)
    lane_values = levels[:, None]
    u_time = (0.2 * np.sin(2 * np.pi * 1000 / fs * np.arange(T)))[None, :]

    # power up once with the base config
    t0 = time.time()
    fr0 = FusedRunner(model, lane_scale_idx=(0,), **base_kw)
    y0, state0, _ = fr0.run(u_time, lane_values, check=False)
    _ = np.asarray(y0[:1, :1, :8])
    print(f"base power-up {time.time()-t0:.1f}s", flush=True)

    y_base = None
    results = {}
    for name in names:
        kw = dict(base_kw)
        kw.update(CONFIGS[name])
        kw["powerup"] = None  # chained runs only
        fr = FusedRunner(model, lane_scale_idx=(0,), **kw)
        t0 = time.time()
        y, state, info = fr.run(u_time, lane_values, state=state0,
                                check=False)
        _ = np.asarray(y[:1, :1, :8])
        print(f"  {name}: compile+warm {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(reps):
            y, state, info = fr.run(u_time, lane_values, state=state,
                                    check=False)
        _ = np.asarray(y[:1, :1, :8])
        wall = (time.time() - t0) / reps
        rt = (T / fs) / wall
        fails = np.asarray(info.fails)
        iters = np.asarray(info.iters).sum(1)
        yh = np.asarray(y[:, 0, :])
        if name == "base":
            y_base = yh
            db = float("nan")  # base vs itself is meaningless
        else:
            ref = max(float(np.max(np.abs(y_base))), 1e-12)
            db = 20 * np.log10(float(np.max(np.abs(yh - y_base))) / ref
                               + 1e-300)
        results[name] = (rt, fails.mean(), int(fails.max()),
                         iters.mean() / T, db)
        print(f"  {name}: RT/lane {rt:.2f}x  fails mean {fails.mean():.2f} "
              f"max {int(fails.max())}  iters/sample {iters.mean()/T:.2f}  "
              f"vs-base {db:.1f} dB", flush=True)

    print("\nsummary:")
    for name, (rt, fm, fx, it, db) in results.items():
        print(f"  {name:10s} RT {rt:5.2f}x  fails {fm:6.2f}/{fx:4d}  "
              f"it/s {it:5.2f}  vs-base {db:6.1f} dB")


if __name__ == "__main__":
    main()
