#!/usr/bin/env python
"""Benchmark: superover parameter sweep on one TPU chip.

Headline workload (BASELINE.md): the 'Der Super Over' overdrive at
44.1 kHz across a drive x tone pot grid -- L independent parameter lanes
through the fused Pallas kernel, every lane seeded at ITS OWN steady
state (runtime.steadystate_sweep).  Metric: real-time factor per lane at
4096 lanes; target >= 100x.

The benched circuit is the reference's own *simplified* superover (adds
the stiff vb bias source, test/runtests.jl:751-755), whose nonlinearity
decomposes into a chain of small subsystems -- np=(2,2,2,2) with pots
varying, np=(2,1,2) fixed.  CAVEAT (pinned by a strict xfail in
tests/test_examples.py): in multi-root regions the decomposed chain
tracks a different valid orbit than the un-decomposed np=5 circuit, so
chain parity is defined against the chain host oracle (both sides
decompose identically).  The un-decomposed model keeps its own tracked
number in the extras (full_rt / full_parity_db), as does the round-3
input-level sweep (level_rt / level_parity_db).

Timing methodology: the TPU here sits behind an asynchronous tunnel whose
``block_until_ready`` returns before execution finishes, so single-run
timings are fiction.  We time N chained runs ending with a forced
device-to-host fetch and report the amortized per-run cost (run-1 measured
this wrong and over-reported ~80x).

Parity: a stratified sample of lanes (4 corners + seeded interior, 16 by
default) is checked against the float64 scan engine (seeded with the
same per-lane steady states; the scan engine itself is pinned against
the per-sample host runtime at <= -110 dB by tests/, and the host
runtime against independent 50-digit mpmath traces by
tests/test_golden.py) on both the first window and the chained steady
window; the JSON carries worst and median.  The reference solves run at
oracle tol=1e-12, NOT the reference-faithful 1e-10 (solvers.jl:175):
at max-slew samples the residual->z sensitivity spikes and the 1e-10
oracle carries ~-92 dB of its own solver noise -- which was the entire
round-3 "parity floor" (every fused solver tier measured identically
against it; the 1e-12 and 1e-13 oracle series agree to <= -133 dB).  References are cached on
disk (.hostref_cache.npz, committed) -- they are deterministic, and the
fused outputs under test are always fresh.  The per-lane steady seeds
are likewise cached (.steadyseed_cache.npz) -- deterministic host-side
numpy, ~13 min cold at 4096 lanes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _build_model(sweep: str, variant: str, fs: int):
    from acme_tpu.models import superover_model
    vb = variant == "chain"
    if sweep == "pots":
        return superover_model(drive=None, tone=None, level=1.0, fs=fs,
                               vb_source=vb)
    return superover_model(drive=1.0, tone=1.0, level=1.0, fs=fs,
                           vb_source=vb)


def _lane_grid(sweep: str, L: int):
    """The lane axis: (levels, drive, tone, lane_values, lane_cfg)."""
    import numpy as np
    if sweep == "pots":
        # drive x tone grid over 5%..95% pot travel (the exact end stops
        # are singular operating points; the reference warns there too)
        a = max(1, int(np.sqrt(L)))
        while L % a:
            a -= 1
        b = L // a
        drive = np.repeat(np.linspace(0.05, 0.95, a), b)
        tone = np.tile(np.linspace(0.05, 0.95, b), a)
        return (None, drive, tone, np.stack([drive, tone], axis=1),
                dict(lane_input_idx=(1, 2)))
    levels = np.linspace(0.1, 2.0, L)
    return levels, None, None, levels[:, None], dict(lane_scale_idx=(0,))


def _scan_parity_worker(payload):
    """Compute float64 references for ALL parity lanes in one batched run
    of the scan engine (seeded per the run's power-up protocol).

    The scan engine is the parity oracle here because it is (a) pinned
    against the per-sample host runtime at <= -110 dB on every bundled
    example by tests/test_engine.py + tests/test_examples.py (and the
    host runtime against independent 50-digit mpmath golden traces by
    tests/test_golden.py), and (b) vectorized over lanes, so 16
    reference lanes cost one batched run instead of 16 serial
    pure-python runs.  Runs in a spawn subprocess pinned to CPU: float64
    on the tunneled TPU is software-emulated and can crash the worker.

    Window bookkeeping matches the fused bench protocol exactly: the
    power-up reference is window 1; the steady reference is window
    2 + reps (the fused run does power-up, one untimed warm-up, then
    ``reps`` timed chained runs)."""
    (sweep, variant, fs, T, reps, levels, drives, tones, powerup) = payload
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    from acme_tpu.engine import compile_model
    from acme_tpu.ops.fused import enable_compile_cache
    enable_compile_cache()  # scan compiles are minutes on one core; cache them

    model = _build_model(sweep, variant, fs)
    # REFERENCE TOLERANCE MATTERS: the reference-faithful absolute Newton
    # tolerance (1e-10, solvers.jl:175) leaves ~1e-5 z error at max-slew
    # samples where the residual->z sensitivity spikes -- measured: the
    # 1e-10 oracle differs from a 1e-13 oracle by -92.5 dB worst on the
    # level sweep, which was the ENTIRE round-3 "parity floor" (every
    # fused config measured identically against it).  References for a
    # -100 dB parity target therefore run at tol=1e-12 (validated: the
    # 1e-12 and 1e-13 oracle series agree to <= -133 dB).
    cm = compile_model(model, tol=1e-12)
    # steady seeding: exact per-lane fixed points can sit at operating
    # points whose f64 residual floor is just above the engine's strict
    # 1e-10 absolute tolerance; a slightly relaxed tol keeps the solves
    # certifying there (z error ~ cond * 1e-9, far below parity scale)
    cm_seed = compile_model(model, tol=1e-9) if powerup == "steady" \
        else None
    base = 0.2 * np.sin(2 * np.pi * 1000 / fs * np.arange(T))
    if sweep == "pots":
        lane_values = np.stack([drives, tones], axis=1)
        # powerup="steady": the fused run starts at the per-lane steady
        # state, so the reference must too (same protocol both sides)
        state = cm_seed.steady_initial_state(lane_values, (1, 2)) \
            if powerup == "steady" else None
        y_pw, state, _ = cm.run_sweep(base[None, :], lane_values, (1, 2),
                                      state=state)
        y_st = y_pw
        for _ in range(reps + 1):
            y_st, state, _ = cm.run_sweep(base[None, :], lane_values,
                                          (1, 2), state=state)
    else:
        u = np.asarray(levels)[:, None, None] * base[None, None, :]
        state = None
        if powerup == "steady":
            # level lanes share one steady state (input scale, audio at 0)
            s1 = cm_seed.steady_initial_state()
            state = cm.initial_state(len(levels), x=np.asarray(s1["x"])[0])
            state["warms"] = tuple(
                type(w)(p=np.broadcast_to(np.asarray(sw.p)[0],
                                          np.asarray(w.p).shape),
                        z=np.broadcast_to(np.asarray(sw.z)[0],
                                          np.asarray(w.z).shape),
                        dzdp=np.broadcast_to(np.asarray(sw.dzdp)[0],
                                             np.asarray(w.dzdp).shape))
                for w, sw in zip(state["warms"], s1["warms"]))
        y_pw, state, _ = cm.run(u, state=state)
        y_st = y_pw
        for _ in range(reps + 1):
            y_st, state, _ = cm.run(u, state=state)
    return (np.asarray(y_pw[:, 0, :], np.float32),
            np.asarray(y_st[:, 0, :], np.float32))


def _select_parity_lanes(L, K, stress=()):
    """Stratified parity lane sample: 4 corners + seeded interior, plus
    any explicit ``stress`` lanes (added on top of K).  Deterministic
    (fixed seed) so bench runs and --gen-refs agree on which lanes carry
    cached references."""
    import numpy as np
    rng = np.random.default_rng(20260817)
    corners = [0, L - 1, L // 2, 1] if L >= 4 else list(range(L))
    interior = sorted(
        set(rng.integers(2, max(L - 2, 3), size=4 * K).tolist())
        - set(corners))[:max(0, K - len(corners))]
    return sorted(set(corners[:K]) | set(interior)
                  | set(i for i in stress if 0 <= i < L))


def _stress_lanes(sweep, L):
    """Known hard lanes that the stratified sample under-covers, pinned
    so the parity story is measured exactly where the solver works
    hardest.  Pots grid: two dead-zone-TRAVERSAL lanes (drive ~0.76-0.78,
    mid tone) where the audio swing crosses subsystem 1's residual dead
    zone ~200 samples/s and the fused kernel logs its only convergence
    fails (_diag_fails.py, round 5); their parity vs the f64 oracle is
    what bounds those fails."""
    if sweep == "pots" and L >= 64:
        return [int(0.78711 * L), int(0.80713 * L)]
    return []


def _parity_refs(args, sweep, variant, T, reps, powerup, lanes_sel,
                 lane_params, cached_only=False):
    """Fetch (or compute + cache) the f64 scan-engine references for the
    selected lanes; returns ([(y_pw, y_st)], lanes) for the lanes that
    have references.

    ``cached_only=True`` (the default for ALL timed bench runs since
    round 5) never COMPUTES references -- a cold 16-lane tol=1e-12
    oracle run costs ~1 h of single-core CPU, which must never gate a
    timed benchmark (round 4's driver run died exactly there,
    BENCH_r04.json rc=124).  References come from the committed
    .hostref_cache.npz, regenerated by ``--gen-refs`` after protocol
    changes; lanes without cached references are dropped from the
    parity sample with a log line (no silent caps); RT numbers are
    unaffected."""
    import numpy as np
    cache_path = os.environ.get(
        "ACME_TPU_HOSTREF_CACHE", os.path.join(HERE, ".hostref_cache.npz"))
    cache = {}
    if os.path.exists(cache_path):
        try:
            cache = dict(np.load(cache_path))
        except Exception as e:  # corrupt cache: recompute
            log(f"reference cache unreadable ({e}); recomputing")

    def lanekey(i):
        lv, d, tn = lane_params(i)
        tag = "_steady" if powerup == "steady" else ""
        # scan2: references at oracle tol=1e-12 (scan1 keys carried the
        # reference-faithful 1e-10 solver's own -92 dB noise).
        # scan3: the round-5 reduce_pdims fold fix changed EVERY
        # decomposed (chain) model -- the varying-pot one catastrophically
        # (its output row read a dead z component), and the fixed-pot
        # chain one measurably too (its reduced subsystems carry nonzero
        # earlier-z couplings of 1e-4..4e-6, so the fold lines are not
        # no-ops there either; measured: pre-fix level refs scored the
        # post-fix kernel at +15 dB power-up).  Only the un-decomposed
        # 'full' variant (single subsystem, offset 0) is untouched and
        # keeps its scan2 keys.
        ver = "scan2" if variant == "full" and sweep != "pots" else "scan3"
        return ("{}_{}_{}_fs{}_T{}_r{}_lv{:.6f}_d{:.6f}_t{:.6f}{}"
                .format(ver, sweep, variant, args.fs, T, reps, lv, d, tn,
                        tag))

    missing = [i for i in lanes_sel if lanekey(i) + "_pw" not in cache]
    t0 = time.time()
    if missing and cached_only:
        log(f"parity refs: {len(missing)}/{len(lanes_sel)} lanes have no "
            "cached reference and cached_only is set (secondary run); "
            "scoring parity on the cached subset only")
        lanes_sel = [i for i in lanes_sel if i not in set(missing)]
        missing = []
    if missing:
        payload = (sweep, variant, args.fs, T, reps,
                   np.array([lane_params(i)[0] for i in missing]),
                   np.array([lane_params(i)[1] for i in missing]),
                   np.array([lane_params(i)[2] for i in missing]),
                   powerup)
        if args.smoke or getattr(args, "gen_refs", False):
            ys_pw, ys_st = _scan_parity_worker(payload)
        else:
            import multiprocessing as mp
            ctx = mp.get_context("spawn")
            env_save = os.environ.get("PALLAS_AXON_POOL_IPS")
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # worker: CPU
            os.environ["JAX_PLATFORMS"] = "cpu"
            with ctx.Pool(1) as pool:
                ys_pw, ys_st = pool.apply(_scan_parity_worker, (payload,))
            if env_save is not None:
                os.environ["PALLAS_AXON_POOL_IPS"] = env_save
        for n, i in enumerate(missing):
            cache[lanekey(i) + "_pw"] = ys_pw[n]
            cache[lanekey(i) + "_st"] = ys_st[n]
        try:
            np.savez_compressed(cache_path, **cache)
        except Exception as e:
            log(f"reference cache not saved: {e}")
    log(f"float64 parity refs (scan engine): {len(lanes_sel)} lanes "
        f"({len(missing)} computed, {len(lanes_sel)-len(missing)} cached) "
        f"in {time.time()-t0:.1f}s")
    return ([(cache[lanekey(i) + "_pw"], cache[lanekey(i) + "_st"])
             for i in lanes_sel], lanes_sel)


# Steady-seed cache protocol version: bump when steady_initial_state's
# protocol, the model numbering, or the certified-floor contract changes
# (same convention as the scan1->scan2 bump in _parity_refs lanekey) --
# the committed .steadyseed_cache.npz would otherwise be silently reused
# with stale state/floors.
# seed2: the round-5 reduce_pdims fold fix changed the varying-pot
# (pots-sweep) model matrices -- seed1 seeds were computed on a model
# whose output row read a dead z component.
SEED_TAG_VER = "seed2"


def _steady_seed_cached(fr, lane_values, tag):
    """Per-lane steady seeds are deterministic host-side numpy (~13 min
    at 4096 lanes), so cache them on disk (committed) keyed by the
    workload tag; restores both the kernel state and the dead-zone
    residual floors (certified-with-floor contract)."""
    import numpy as np

    import jax.numpy as jnp
    path = os.environ.get("ACME_TPU_SEED_CACHE",
                          os.path.join(HERE, ".steadyseed_cache.npz"))
    cache = {}
    if os.path.exists(path):
        try:
            cache = dict(np.load(path))
        except Exception as e:
            log(f"seed cache unreadable ({e}); recomputing")
    keys = ("x", "xlo", "z", "zlo", "zw", "wp", "dzdp", "pmode", "floors")
    if all(f"{tag}_{k}" in cache for k in keys):
        log(f"steady seed: cache hit ({tag})")
        state = {k: jnp.asarray(cache[f"{tag}_{k}"]) for k in keys[:-1]}
        fr._steady_floors = np.asarray(cache[f"{tag}_floors"])
        return state
    t0 = time.time()
    state = fr.steady_initial_state(lane_values)
    log(f"steady_initial_state: {time.time()-t0:.1f}s (cached for reuse)")
    for k in keys[:-1]:
        cache[f"{tag}_{k}"] = np.asarray(state[k])
    cache[f"{tag}_floors"] = np.asarray(
        getattr(fr, "_steady_floors", np.zeros((len(lane_values), 1))))
    try:
        np.savez_compressed(path, **cache)
    except Exception as e:
        log(f"seed cache not saved: {e}")
    return state


def run_fused(args, sweep, variant, L, reps, parity_lanes, label,
              parity_cached_only=True):
    """One fused benchmark: build, power up / seed, time chained runs,
    parity-check a stratified lane sample.  Returns a metrics dict."""
    import numpy as np

    from acme_tpu.ops.fused import FusedRunner
    t0 = time.time()
    model = _build_model(sweep, variant, args.fs)
    log(f"[{label}] model build: {time.time()-t0:.1f}s ({variant}) "
        f"np={[model.np(i) for i in range(model.nsubsystems)]} "
        f"nn={[model.nn(i) for i in range(model.nsubsystems)]} "
        f"nx={model.nx}")
    T = max(16, int(round(args.seconds * args.fs)))
    u_time = (0.2 * np.sin(2 * np.pi * 1000 / args.fs
                           * np.arange(T)))[None, :]
    levels, drive, tone, lane_values, lane_cfg = _lane_grid(sweep, L)

    df_polish = {"plain_final": "plain_final", "comp_final": "comp_final",
                 "final": "final", "full": True, "off": False}[args.df_polish]
    gl = args.group_lanes if args.group_lanes > 0 else L
    powerup = {"safe": "safe", "none": None,
               "steady": "steady"}[args.powerup]
    t0 = time.time()
    fr = FusedRunner(model, newton_iters=args.newton_iters, tol=1e-9,
                     group_lanes=gl, interpret=args.smoke,
                     fast_iters=args.fast_iters, df_polish=df_polish,
                     fast_verify="merge", polish_only=args.polish_only,
                     polish_fixed=args.polish_fixed,
                     verdict_refine=args.verdict_refine,
                     verdict_jac=args.verdict_jac,
                     df_solve=(True if getattr(args, "df_solve", False)
                               else "auto"),
                     powerup=powerup, **lane_cfg)
    log(f"[{label}] runner build (centering + floors): "
        f"{time.time()-t0:.1f}s")
    state = None
    if powerup == "steady":
        tag = f"{SEED_TAG_VER}_{sweep}_{variant}_fs{args.fs}_L{L}"
        state = _steady_seed_cached(fr, lane_values, tag)
    t0 = time.time()
    y0, state, info0 = fr.run(u_time, lane_values, state=state,
                              check=False)
    _ = np.asarray(y0[:1, :1, :8])  # sync: true completion (tiny fetch)
    compile_s = time.time() - t0
    f0 = np.asarray(info0.fails)
    log(f"[{label}] compile+first run: {compile_s:.1f}s (cold only on "
        f"first process: persistent compile cache)  "
        f"fails/lane mean {f0.mean():.1f} max {int(f0.max())} of {T}")
    out = {"compile_powerup_s": round(compile_s, 1),
           "powerup_fails_mean": round(float(f0.mean()), 2)}
    # untimed warm-up chained run: with the two-phase power-up the first
    # run compiled different time shapes than the chained runs, so the
    # full-T fast kernel compiles here, not in the timed loop
    t0 = time.time()
    y, state, info = fr.run(u_time, lane_values, state=state, check=False)
    _ = np.asarray(y[:1, :1, :8])
    log(f"[{label}] warmup chained run: {time.time()-t0:.1f}s")
    # check=False keeps the chained runs fully asynchronous (the
    # user-level failure check costs one host round-trip per run); fails
    # are inspected from FusedInfo below instead
    t0 = time.time()
    for _ in range(reps):
        y, state, info = fr.run(u_time, lane_values, state=state,
                                check=False)
    _ = np.asarray(y[:1, :1, :8])  # sync
    wall = (time.time() - t0) / reps
    fails = np.asarray(info.fails)
    iters = np.asarray(info.iters).sum(1)
    out["fails_mean"] = round(float(fails.mean()), 2)
    out["fails_max"] = int(fails.max())
    if info.floored is not None:
        # samples accepted at a certified residual floor (dead-zone
        # traversal; see FusedInfo.floored) -- reported next to fails so
        # floor acceptance never hides the dead-zone count
        fl = np.asarray(info.floored)
        out["floored_mean"] = round(float(fl.mean()), 2)
        out["floored_max"] = int(fl.max())
    out["iters_per_sample_mean"] = round(float(iters.mean()) / T, 2)
    audio_s = T / args.fs
    rt = audio_s / wall
    out["rt"] = round(rt, 3)
    log(f"[{label}] timed: {wall*1e3:.1f} ms/run for {audio_s:.3f}s audio "
        f"x {L} lanes ({reps} chained reps)")
    log(f"[{label}] RT-factor per lane: {rt:.2f}x   aggregate: "
        f"{rt*L:.0f}x realtime   ({rt*L*args.fs/1e6:.1f} Msamples/s)")

    if parity_lanes > 0:
        K = min(parity_lanes, L)
        lanes_sel = _select_parity_lanes(L, K, _stress_lanes(sweep, L))

        def lane_params(i):
            return (float(levels[i]) if levels is not None else 1.0,
                    float(drive[i]) if drive is not None else 1.0,
                    float(tone[i]) if tone is not None else 1.0)

        cached_only = parity_cached_only and not getattr(
            args, "compute_refs", False)
        results, lanes_sel = _parity_refs(args, sweep, variant, T, reps,
                                          args.powerup, lanes_sel,
                                          lane_params,
                                          cached_only=cached_only)
        dbs_pw, dbs_st = [], []
        for i, (yh_pw, yh_st) in zip(lanes_sel, results):
            ref = max(float(np.max(np.abs(yh_st))), 1e-12)
            y0i = np.asarray(y0[i, 0, :])
            yi = np.asarray(y[i, 0, :])
            db_pw = 20 * np.log10(
                float(np.max(np.abs(y0i - yh_pw))) / ref + 1e-300)
            db_st = 20 * np.log10(
                float(np.max(np.abs(yi - yh_st))) / ref + 1e-300)
            dbs_pw.append(db_pw)
            dbs_st.append(db_st)
            log(f"[{label}]   lane {i}: power-up {db_pw:.1f} dB, "
                f"steady {db_st:.1f} dB")
        if dbs_st:
            out["parity_db"] = round(max(dbs_pw), 1)
            out["parity_steady_db"] = round(max(dbs_st), 1)
            out["parity_median_db"] = round(float(np.median(dbs_st)), 1)
            out["parity_lanes"] = len(lanes_sel)
            log(f"[{label}] parity: power-up worst {out['parity_db']} dB; "
                f"steady worst {out['parity_steady_db']} dB median "
                f"{out['parity_median_db']} dB over {len(lanes_sel)} lanes")
        else:
            log(f"[{label}] parity: SKIPPED (no cached references; "
                "cached-only secondary run)")
    return out


def gen_refs(args):
    """Regenerate the f64 parity-reference cache (CPU-only; no TPU).

    Computes the scan-engine oracle series for every (workload, lane)
    the default bench run scores -- the pots-grid primary plus the
    level-sweep and full-model secondaries -- in lane chunks
    (``--gen-refs-chunk``, default 16 = one batched run per job: the
    scan engine is lane-vectorized and overhead-dominated on CPU, so a
    16-lane batch costs barely more than a 4-lane one; smaller chunks
    trade wall time for resumability, each chunk saving the cache on
    completion).  The job matrix mirrors the DEFAULT bench
    configuration (powerup/reps/lane caps as main() resolves them with
    no flags); a bench run with non-default --powerup/--reps/--lanes
    produces different cache keys and must gen-refs with the same
    flags.  Run once after a protocol or oracle change, then commit
    .hostref_cache.npz so timed bench runs stay warm."""
    args.gen_refs = True
    T = max(16, int(round(args.seconds * args.fs)))
    L = args.lanes
    if (args.reps, args.powerup, args.parity_lanes) != (5, "steady", 16):
        # the job matrix below hardcodes the DEFAULT bench config; a
        # non-default run produces different cache keys and would
        # quietly score parity on a shrunken subset (ADVICE r4)
        log(f"gen-refs WARNING: non-default --reps/--powerup/"
            f"--parity-lanes ({args.reps}/{args.powerup}/"
            f"{args.parity_lanes}); the job matrix covers the DEFAULT "
            "bench configuration -- a bench run with these flags may "
            "miss cache keys")
    jobs = [
        ("pots", args.model, args.reps, "steady",
         min(args.parity_lanes, 16)),
        ("level", "chain", 2, "safe", min(args.parity_lanes, 16)),
        ("level", "full", 2, "safe", min(args.parity_lanes, 8)),
    ]
    for sweep, variant, reps, powerup, K in jobs:
        levels, drive, tone, _lv, _cfg = _lane_grid(sweep, L)
        lanes_sel = _select_parity_lanes(L, min(K, L),
                                         _stress_lanes(sweep, L))

        def lane_params(i, levels=levels, drive=drive, tone=tone):
            return (float(levels[i]) if levels is not None else 1.0,
                    float(drive[i]) if drive is not None else 1.0,
                    float(tone[i]) if tone is not None else 1.0)

        log(f"gen-refs: {sweep}/{variant} reps={reps} powerup={powerup} "
            f"lanes={lanes_sel}")
        for c in range(0, len(lanes_sel), args.gen_refs_chunk):
            _parity_refs(args, sweep, variant, T, reps, powerup,
                         lanes_sel[c:c + args.gen_refs_chunk], lane_params)
    log("gen-refs: done")


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
    ap.add_argument("--model", choices=["chain", "full"], default="chain",
                    help="chain = reference's simplified (vb-source) "
                         "decomposed superover; full = un-decomposed")
    ap.add_argument("--sweep", choices=["level", "pots"], default="pots",
                    help="headline lane axis: drive x tone pot grid "
                         "(default; pots-as-inputs model, BASELINE.md's "
                         "flagship) or per-lane input level")
    ap.add_argument("--group-lanes", type=int, default=0,
                    help="lanes per independent kernel grid group; 0 "
                         "(default) = one group covering all lanes "
                         "(measured fastest: fewer grid steps amortize "
                         "per-op overhead)")
    ap.add_argument("--fast-iters", type=int, default=1,
                    help="unguarded Newton steps per sample before the "
                         "verifying polish (production default 1; 0 = "
                         "fully gated loop)")
    ap.add_argument("--polish-only", action="store_true",
                    help="zero unguarded fast steps: the extrapolated warm "
                         "start goes straight into the polish, whose "
                         "mandatory first step is the sample's Newton step")
    ap.add_argument("--polish-fixed", type=int, default=2,
                    help="unrolled prefix of the polish loop before the "
                         "early-exiting continuation (production default "
                         "2: the typical steady lane finishes inside the "
                         "prefix with zero group reductions)")
    ap.add_argument("--verdict-refine", type=int, default=None,
                    help="iterative-refinement sweeps of the final "
                         "verdict elimination (default: runner refine)")
    ap.add_argument("--verdict-jac", default="df", choices=["df", "plain"],
                    help="Jacobian precision of the final df verdict")
    ap.add_argument("--df-polish", default="comp_final",
                    choices=["plain_final", "comp_final", "final", "full",
                             "off"],
                    help="verdict tier: comp_final = plain polish loop + "
                         "one compensated verdict eval/step (production "
                         "default, 4.07x); plain_final = same loop + "
                         "full-df verdict (2.8 dB better steady parity "
                         "at ~-30% speed)")
    ap.add_argument("--powerup", choices=["safe", "none", "steady"],
                    default=None,
                    help="fresh-state start: 'steady' = per-lane "
                         "host-computed steady start (default for the "
                         "pots sweep; no transient, seeds cached on "
                         "disk); 'safe' = two-phase conservative first "
                         "window (default for the level sweep); 'none' = "
                         "fast config from x = 0")
    ap.add_argument("--no-powerup-phase", action="store_true",
                    help="deprecated alias for --powerup none")
    ap.add_argument("--df-solve", action="store_true",
                    help="solve the final verdict's Newton system in "
                         "double-float (requires a df verdict tier; "
                         "fixes null-direction z error at cond spikes)")
    ap.add_argument("--compare-verdicts", action="store_true",
                    help="after the primary run, re-measure the primary "
                         "workload under the plain_final (full-df "
                         "verdict) and df_solve tiers: RT + parity per "
                         "tier in the extras (VERDICT r3 ask #2)")
    ap.add_argument("--parity-lanes", type=int, default=16,
                    help="stratified parity sample size (0 disables)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-safe smoke run")
    ap.add_argument("--gen-refs", action="store_true",
                    help="regenerate the f64 parity-reference cache on "
                         "CPU (no TPU; hours cold, resumable) and exit")
    ap.add_argument("--gen-refs-chunk", type=int, default=16,
                    help="lanes per gen-refs cache-save chunk (16 = one "
                         "batched run per job, fastest; smaller chunks "
                         "resume better)")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the float64 host parity check")
    ap.add_argument("--compute-refs", action="store_true",
                    help="allow the parity pass to COMPUTE missing "
                         "references in-run (~1 h/16 lanes of single-core "
                         "CPU; default scores from the committed cache "
                         "only -- use --gen-refs to fill it)")
    ap.add_argument("--deadline", type=float, default=3000.0,
                    help="soft wall-clock budget in seconds: stages that "
                         "would start after this is spent are skipped "
                         "with a log line; the final JSON always prints")
    ap.add_argument("--primary-only", action="store_true",
                    help="skip the secondary (level-sweep and full-model) "
                         "tracking runs")
    args = ap.parse_args()
    if args.no_powerup_phase:
        args.powerup = "none"
    if args.powerup is None:
        args.powerup = "steady" if args.sweep == "pots" else "safe"
    if args.no_parity:
        args.parity_lanes = 0
    if args.df_solve and args.df_polish not in ("plain_final", "final",
                                                "full"):
        # FusedRunner gates df_solve on a df verdict tier; without this
        # guard a --df-solve run would silently report comp_final numbers
        log(f"--df-solve requires a df verdict tier (plain_final/final/"
            f"full); got --df-polish {args.df_polish}. Forcing "
            "plain_final so the flag measures what it says.")
        args.df_polish = "plain_final"

    if args.gen_refs:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        gen_refs(args)
        return

    if args.smoke:
        # CPU sanity path: the float64 scan engine compiles quickly on CPU;
        # interpret-mode Pallas would take minutes for the nn=7 kernel
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        args.lanes = 16
        args.seconds = min(args.seconds, 0.005)
        args.engine = "scan"
        args.sweep = "pots"
        args.powerup = "safe"
        args.reps = 1
        args.parity_lanes = min(args.parity_lanes, 2)
        args.compute_refs = True  # tiny T: refs are cheap, keys unique

    import numpy as np

    tpu_unavailable = False
    if not args.smoke:
        # The TPU sits behind a tunnel whose local forwarder can die (a
        # >12 h outage was observed); jax backend init then HANGS rather
        # than erroring.  Probe it in a bounded subprocess first and fall
        # back to the honest CPU smoke configuration -- clearly marked --
        # instead of hanging the whole benchmark run.
        import subprocess
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
                 "(x @ x).block_until_ready(); print('TPU_OK')"],
                capture_output=True, text=True, timeout=180)
            probe_out, probe_err = probe.stdout, probe.stderr
        except subprocess.TimeoutExpired:
            probe_out, probe_err = "", "probe timed out after 180s"
        if "TPU_OK" not in probe_out:
            log("TPU unavailable (probe failed); falling back to the CPU "
                "scan-engine smoke configuration")
            log(probe_err.strip()[-300:])
            tpu_unavailable = True
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            os.environ["JAX_PLATFORMS"] = "cpu"
            args.smoke = True
            args.lanes = 16
            args.seconds = min(args.seconds, 0.005)
            args.engine = "scan"
            args.sweep = "pots"
            args.powerup = "safe"
            args.reps = 1
            args.parity_lanes = min(args.parity_lanes, 2)
            args.compute_refs = True

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    log(f"devices: {jax.devices()}")

    T = max(16, int(round(args.seconds * args.fs)))
    L = args.lanes
    extras = {}
    if tpu_unavailable:
        extras["tpu_unavailable"] = True
    t_start = time.time()
    # Budget clock (round-4 lesson: the driver's timed run must ALWAYS
    # produce the JSON line).  compare-verdict runs are explicitly
    # opted-in extra measurement, so their cost doesn't count against
    # the secondary stages' budget (tracked in t_exempt).
    t_exempt = [0.0]

    def over_budget(label):
        spent = time.time() - t_start - t_exempt[0]
        if spent > args.deadline:
            log(f"{label} SKIPPED ({spent:.0f}s spent > --deadline "
                f"{args.deadline:.0f}s soft budget)")
            return True
        return False

    if args.engine == "fused":
        try:
            primary = run_fused(args, args.sweep, args.model, L, args.reps,
                                args.parity_lanes, "primary")
            rt_per_lane = primary.pop("rt")
            extras.update(primary)
        except Exception as e:
            # even a dead primary must produce the JSON line (round-4
            # lesson); value null + error beats a silent rc!=0
            log(f"[primary] FAILED: {e!r}")
            import traceback
            traceback.print_exc(file=sys.stderr)
            rt_per_lane = None
            extras["primary_error"] = repr(e)[:300]
            args.compare_verdicts = False
            args.primary_only = True
        if args.compare_verdicts and not args.smoke:
            # verdict-tier comparison on the primary workload (same seeds,
            # same parity references -- the run protocol is identical, so
            # windows line up): comp_final (the production default above)
            # vs the full-df verdict vs the df-elimination verdict
            import copy
            t_cmp = time.time()
            for name, over in (
                    ("plainfinal", dict(df_polish="plain_final")),
                    ("dfsolve", dict(df_polish="plain_final",
                                     df_solve=True))):
                a3 = copy.copy(args)
                for k, v in over.items():
                    setattr(a3, k.replace("-", "_"), v)
                r = run_fused(a3, args.sweep, args.model, L, args.reps,
                              args.parity_lanes, name)
                extras[f"{name}_rt"] = r["rt"]
                if "parity_steady_db" in r:
                    extras[f"{name}_parity_db"] = r["parity_db"]
                    extras[f"{name}_parity_steady_db"] = \
                        r["parity_steady_db"]
            t_exempt[0] += time.time() - t_cmp
        # secondary tracked numbers (VERDICT r3 asks 2/6/7): the round-3
        # input-level sweep and the reference-faithful un-decomposed
        # superover keep measured numbers next to the headline.  Each
        # stage is individually budget-gated (logged -- no silent caps);
        # a failure in one records the error and moves on.
        if not args.primary_only and not args.smoke:
            import copy
            a2 = copy.copy(args)
            a2.powerup = "safe"
            for label, sw, var, reps2, K in (
                    ("level", "level", "chain", 2,
                     min(args.parity_lanes, 16)),
                    ("full", "level", "full", 2,
                     min(args.parity_lanes, 8))):
                if over_budget(f"secondary run '{label}'"):
                    extras["secondary_skipped"] = True
                    break
                try:
                    r = run_fused(a2, sw, var, L, reps2, K, label)
                except Exception as e:  # record, keep the JSON coming
                    log(f"[{label}] FAILED: {e!r}")
                    extras[f"{label}_error"] = repr(e)[:200]
                    continue
                extras[f"{label}_rt"] = r["rt"]
                if "parity_steady_db" in r:
                    extras[f"{label}_parity_db"] = r["parity_db"]
                    extras[f"{label}_parity_steady_db"] = \
                        r["parity_steady_db"]
            # lane-scaling curve (level sweep, no parity): RT/lane at
            # the other lane counts so the throughput-vs-latency
            # trade-off is a tracked number, not a README-only table.
            # 128..1024 map the latency frontier (VERDICT r4 ask #4);
            # 8192/16384 map the saturation side.
            for Ls in (128, 256, 512, 1024, 8192, 16384):
                if over_budget(f"lane-scaling run at {Ls}"):
                    extras[f"level_rt_{Ls}"] = None
                    continue
                try:
                    sc = run_fused(a2, "level", "chain", Ls, 2, 0,
                                   f"scale{Ls}")
                    extras[f"level_rt_{Ls}"] = sc["rt"]
                except Exception as e:
                    log(f"[scale{Ls}] FAILED: {e!r}")
                    extras[f"level_rt_{Ls}"] = None
                    extras[f"level_rt_{Ls}_error"] = repr(e)[:200]
    else:
        if args.sweep != "pots":
            raise SystemExit("--engine scan supports --sweep pots only")
        from acme_tpu.engine import compile_model
        model = _build_model(args.sweep, args.model, args.fs)
        levels, drive, tone, lane_values, _ = _lane_grid(args.sweep, L)
        u_time = (0.2 * np.sin(2 * np.pi * 1000 / args.fs
                               * np.arange(T)))[None, :]
        cm = compile_model(model,
                           tol=1e-9 if args.powerup == "steady" else None)
        t0 = time.time()
        state = None
        if args.powerup == "steady":
            state = cm.steady_initial_state(lane_values, (1, 2))
            log(f"steady_initial_state: {time.time()-t0:.1f}s")
            t0 = time.time()
        y0, state, info = cm.run_sweep(u_time, lane_values, (1, 2),
                                       state=state)
        _ = np.asarray(y0[:1, :1, :8])
        log(f"compile+power-up run: {time.time()-t0:.1f}s")
        # untimed warm-up window so the steady window index (2 + reps)
        # matches the fused protocol and the parity references
        y, state, info = cm.run_sweep(u_time, lane_values, (1, 2),
                                      state=state)
        t0 = time.time()
        for _ in range(args.reps):
            y, state, info = cm.run_sweep(u_time, lane_values, (1, 2),
                                          state=state)
        _ = np.asarray(y[:1, :1, :8])
        wall = (time.time() - t0) / args.reps
        rt_per_lane = (T / args.fs) / wall
        extras["fails_mean"] = 0.0
        log(f"RT-factor per lane: {rt_per_lane:.2f}x")

    variant_note = ("chain model: the reference's simplified vb-source "
                    "superover; decomposition-faithful, but a different "
                    "circuit from the full np=5 superover in multi-root "
                    "regions" if args.model == "chain" else "full model")
    print(json.dumps({
        "metric": "superover RT-factor per lane @44.1kHz, "
                  f"{L} lanes ("
                  f"{'drive x tone pot grid' if args.sweep == 'pots' else 'input-level sweep'}, "
                  f"{variant_note}), "
                  f"{'fused float32 kernel' if args.engine == 'fused' else 'float64 scan engine'}"
                  + (", per-lane steady-seeded"
                     if args.powerup == "steady" else ""),
        "value": None if rt_per_lane is None else round(rt_per_lane, 3),
        "unit": "x realtime per lane",
        "vs_baseline": None if rt_per_lane is None
        else round(rt_per_lane / 100.0, 4),
        **extras,
    }))


if __name__ == "__main__":
    main()
