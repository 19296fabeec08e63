"""Fused Pallas kernel tests (interpret mode on CPU).

Interpret mode executes the kernel op-by-op, so these use short sequences
and mostly run with the cheap kernel options (no compensated residual /
extrapolation); the full-accuracy configuration is exercised on real TPU
hardware by bench.py and recorded in BENCH_r*.json.
"""

import numpy as np
import pytest

import acme_tpu as A
from acme_tpu import models as M
from acme_tpu.engine import compile_model
from acme_tpu.ops.fused import FusedRunner

FAST = dict(newton_iters=12, tol=1e-9, interpret=True,
            compensated=False, extrapolate=False)


@pytest.fixture(scope="module")
def clipper_ref():
    T = 384
    u = (0.5 * np.sin(2 * np.pi * 1000 / 44100 * np.arange(T)))[None, :]
    y64 = np.asarray(compile_model(M.diodeclipper_model()).run(u)[0])
    return u, y64


def test_fused_clipper_parity(clipper_ref):
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), time_chunk=128, **FAST)
    y, st, fails = fr.run(u, np.zeros((128, 0)))
    fails = fails.fails
    assert int(np.asarray(fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0]))
    ref = np.max(np.abs(y64))
    assert 20 * np.log10(err / ref) < -100


def test_fused_clipper_compensated(clipper_ref):
    # the full-accuracy configuration (compensated residual + extrapolated
    # warm starts), short run
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True)
    y, st, fails = fr.run(u[:, :128], np.zeros((128, 0)))
    fails = fails.fails
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :128]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_state_carry(clipper_ref):
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), time_chunk=128, **FAST)
    y1, st, _ = fr.run(u[:, :200], np.zeros((128, 0)))
    y2, st, _ = fr.run(u[:, 200:], np.zeros((128, 0)), state=st)
    y = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=2)
    err = np.max(np.abs(y[0, 0] - y64[0]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_uneven_length_exact_tail(clipper_ref):
    # T not divisible by the chunk: the padded tail is masked and must not
    # advance the state
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), time_chunk=256, **FAST)
    y, st, _ = fr.run(u[:, :300], np.zeros((128, 0)))
    assert np.asarray(y).shape[2] == 300
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :300]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_lane_sweep_birdie():
    T = 104
    u = (0.1 * np.sin(2 * np.pi * 1000 / 44100 * np.arange(T)))[None, :]
    m = M.birdie_model()  # vol pot = input 1
    fr = FusedRunner(m, lane_input_idx=(1,), time_chunk=104, **FAST)
    vols = np.full((128, 1), 0.8)
    vols[64:] = 0.3
    y, st, fails = fr.run(u, vols)
    fails = fails.fails
    # lane 0 (vol=0.8) against the f64 engine with the full input
    u_full = np.vstack([u, np.full((1, T), 0.8)])
    y64, _, _ = compile_model(M.birdie_model()).run(u_full)
    err = np.max(np.abs(np.asarray(y)[0, 0] - np.asarray(y64)[0]))
    ref = np.max(np.abs(np.asarray(y64)))
    # loose bound: this FAST config trades accuracy for interpret-mode
    # speed (no compensated residual, relative gates, K=12); the production
    # configuration measures -93 dB on this sweep on real TPU (STATUS.md)
    assert 20 * np.log10(err / ref) < -60
    # lanes with different vol differ
    assert not np.allclose(np.asarray(y)[0, 0], np.asarray(y)[100, 0])


def test_fused_rejects_bad_lanes():
    fr = FusedRunner(M.birdie_model(), lane_input_idx=(1,), **FAST)
    with pytest.raises(ValueError, match="multiple of 128"):
        fr.run(np.zeros((1, 8)), np.full((7, 1), 0.5))


# -- production-tier coverage (VERDICT r2 weak #5): every solver tier and
# -- runner knob of ops/fused.py reachable from CI, at nn=1/nn=3 interpret
# -- cost.  The full-accuracy numbers for these paths are measured on real
# -- TPU by bench.py; here we pin behavior and wiring.

def test_fused_nonconvergence_fail_counter(clipper_ref):
    """A diode driven backwards by a current source has no solution: the
    whole rescue ladder (gated loop -> homotopy continuation -> df Newton)
    must run out, the per-lane fail counter must fire, and the output must
    stay finite (reference semantics ACME.jl:688-694)."""
    circ = A.Circuit()
    circ.add("d", A.diode())
    circ.add("src", A.currentsource())
    circ.connect(("src", "+"), ("d", "+"))
    circ.connect(("src", "-"), ("d", "-"))
    circ.add("probe", A.voltageprobe())
    circ.connect(("probe", "+"), ("d", "+"))
    circ.connect(("probe", "-"), ("d", "-"))
    model = A.DiscreteModel(circ, 1)
    fr = FusedRunner(model, newton_iters=8, interpret=True, time_chunk=8)
    u = np.array([[-1.0, -1.0, -1.0, -1.0]])
    # user-level failure surface (VERDICT r3 missing #1): the run itself
    # warns -- the caller does NOT have to inspect FusedInfo to learn that
    # lanes missed the gate (reference warn path, ACME.jl:688-691)
    with pytest.warns(UserWarning, match="missed the acceptance gate"):
        y, st, info = fr.run(u, np.zeros((128, 0)))
    assert np.all(np.isfinite(np.asarray(y)))
    fails = np.asarray(info.fails)
    assert int(fails.min()) >= 1  # every lane flagged, every sample counted
    # forward drive converges with zero fails through the same kernel --
    # at production Newton depth: the capped extrapolated start (4 trust
    # regions, see FusedRunner) leaves ~130 sub-knee exponential-crawl
    # iterations on this pathological (zero-impedance) drive, more than
    # this test's deliberately starved newton_iters=8
    fr2 = FusedRunner(A.DiscreteModel(circ, 1), newton_iters=192,
                      interpret=True, time_chunk=8)
    y2, st2, info2 = fr2.run(np.array([[1.0, 1.0, 1.0, 1.0]]),
                             np.zeros((128, 0)))
    assert int(np.asarray(info2.fails).max()) == 0


def test_fused_nonfinite_output_raises(clipper_ref):
    """Non-finite input poisons the output; the run must RAISE (reference:
    error on non-finite mid-run, ACME.jl:692-694) without the caller
    reading FusedInfo.  check=False restores the silent async behavior.
    (A linear model: nonlinear subsystems substitute the last good z for
    non-finite solves by design, which can keep y finite on a poisoned
    sample -- the state/output path has no such guard.)"""
    u, _ = clipper_ref
    fr = FusedRunner(M.sallenkey_model(), time_chunk=128, **FAST)
    u_bad = u[:, :128].copy()
    u_bad[0, 5] = np.inf
    with pytest.raises(RuntimeError, match="non-finite"):
        fr.run(u_bad, np.zeros((128, 0)))
    # opt-out: the same poisoned run completes and returns the output
    with np.errstate(all="ignore"):
        y, st, info = fr.run(u_bad, np.zeros((128, 0)), check=False)
    assert not np.all(np.isfinite(np.asarray(y)))


def test_fused_rescue_tiers_engage_and_recover(clipper_ref):
    """Starve the plain Newton loop (newton_iters=2) on a hard step input:
    the homotopy-continuation / df-rescue tiers must finish the job (zero
    fails) and the iteration counters must show more work than the loop cap
    could have performed -- proof the rescue tiers engaged."""
    u, y64 = clipper_ref
    T = 48
    step = 3.0 * np.ones((1, T))
    step[0, 0] = 0.0
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=2, tol=1e-9,
                     interpret=True, time_chunk=48)
    y, st, info = fr.run(step, np.zeros((128, 0)))
    assert int(np.asarray(info.fails).max()) == 0
    iters = np.asarray(info.iters)[:, 0]
    assert int(iters.max()) > 2 * T  # beyond the loop cap: rescue ran
    # and the answers match the f64 engine on the same input
    y64s, _, _ = compile_model(M.diodeclipper_model()).run(step)
    err = np.max(np.abs(np.asarray(y)[0, 0] - np.asarray(y64s)[0]))
    assert 20 * np.log10(err / np.max(np.abs(y64s))) < -80


def test_fused_pivot_off_birdie():
    """pivot=False main path (the production speed knob) on an nn=3
    subsystem, where elimination order actually matters."""
    T = 64
    u = (0.1 * np.sin(2 * np.pi * 1000 / 44100 * np.arange(T)))[None, :]
    m = M.birdie_model(vol=0.8)
    y64, _, _ = compile_model(M.birdie_model(vol=0.8)).run(u)
    fr = FusedRunner(m, pivot=False, time_chunk=64, **FAST)
    y, st, info = fr.run(u, np.zeros((128, 0)))
    assert int(np.asarray(info.fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[0, 0] - np.asarray(y64)[0]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -60


def test_fused_fast_iters_unguarded_path(clipper_ref):
    """fast_iters>0: blind Newton steps verified by the polish residual,
    falling back to the gated loop when the verification fails."""
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     interpret=True, time_chunk=128, fast_iters=2)
    y, st, info = fr.run(u[:, :128], np.zeros((128, 0)))
    assert int(np.asarray(info.fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :128]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_lane_scale_idx(clipper_ref):
    """Per-lane input scaling (one audio stream fanned out at L levels)."""
    u, y64 = clipper_ref
    T = 128
    levels = np.full((128, 1), 1.0)
    levels[64:] = 0.25
    fr = FusedRunner(M.diodeclipper_model(), lane_scale_idx=(0,),
                     newton_iters=12, tol=1e-9, interpret=True,
                     time_chunk=128)
    y, st, info = fr.run(u[:, :T], levels)
    assert int(np.asarray(info.fails).max()) == 0
    err0 = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :T]))
    assert 20 * np.log10(err0 / np.max(np.abs(y64))) < -100
    y64q, _, _ = compile_model(M.diodeclipper_model()).run(0.25 * u[:, :T])
    err1 = np.max(np.abs(np.asarray(y)[100, 0] - np.asarray(y64q)[0]))
    assert 20 * np.log10(err1 / np.max(np.abs(y64))) < -100


def test_fused_multi_group_grid(clipper_ref):
    """group_lanes < L: multiple independent grid groups (G > 1), each
    running its own time axis with VMEM-resident state (ADVICE r2: the
    multi-group path was never exercised in CI)."""
    u, y64 = clipper_ref
    T = 64
    fr = FusedRunner(M.diodeclipper_model(), time_chunk=32,
                     group_lanes=1024, **FAST)
    y, st, info = fr.run(u[:, :T], np.zeros((2048, 0)))
    assert fr._group_S(2048 // 128) == 8  # really 2 groups of 1024
    assert int(np.asarray(info.fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[:, 0, :] - y64[0, :T]).max())
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_per_lane_model_matrices():
    """Component-value sweeps in the FUSED kernel (VERDICT r2 weak #4):
    a list of same-topology models; coefficients that differ become
    per-lane (hi, lo) VMEM tables, the rest stay immediates.  Lane i runs
    models[i % n]; outputs must match per-lane host runs."""
    from acme_tpu.models import diodeclipper

    rs = [820.0, 1000.0, 1500.0, 4700.0]

    def build(r):
        circ = diodeclipper()
        circ.delete("r1")
        circ.add("r1", A.resistor(r))
        circ.connect(("r1", 1), ("j_in", "+"))
        circ.connect(("r1", 2), ("d1", "+"))
        return A.DiscreteModel(circ, 1 / 44100)

    models = [build(r) for r in rs]
    T = 200
    u = 2.0 * np.sin(2 * np.pi * 1000 / 44100 * np.arange(T))[None, :]
    fr = FusedRunner(models, newton_iters=12, tol=1e-9, interpret=True,
                     time_chunk=104)
    assert fr.nvar > 0  # the resistor sweep must register varying entries
    y, st, info = fr.run(u, np.zeros((128, 0)))
    assert int(np.asarray(info.fails).max()) == 0
    for i, r in enumerate(rs):
        yh = A.run(build(r), u)
        ref = np.max(np.abs(yh))
        for lane in (i, i + len(rs)):  # model tiles every n lanes
            err = np.max(np.abs(np.asarray(y)[lane, 0] - yh[0]))
            assert 20 * np.log10(err / ref) < -100, (r, lane)
    # distinct resistors give distinct outputs
    assert np.max(np.abs(np.asarray(y)[0, 0] - np.asarray(y)[3, 0])) > 1e-3


def test_fused_df_final_polish(clipper_ref):
    """df_polish='final': compensated polish loop + one full-df
    evaluation/step per sample (the production speed configuration)."""
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True, df_polish="final")
    y, st, info = fr.run(u[:, :128], np.zeros((128, 0)))
    assert int(np.asarray(info.fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :128]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_comp_final_with_polish_prefix(clipper_ref):
    """The round-4 production configuration: plain polish loop with a
    2-step unrolled prefix + while-loop continuation for tail lanes, and
    a single COMPENSATED (first-order-corrected) verdict eval/step per
    sample (~2x a plain eval instead of ~10x full-df; measured 2.57x ->
    4.07x RT/lane on TPU at a 2.8 dB steady-parity cost)."""
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True, fast_iters=1,
                     fast_verify="merge", df_polish="comp_final",
                     polish_fixed=2)
    y, st, info = fr.run(u[:, :128], np.zeros((128, 0)))
    assert int(np.asarray(info.fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :128]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100
    # df_solve requires a df-mode verdict; comp_final must force it off
    fr2 = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                      time_chunk=128, interpret=True,
                      df_polish="comp_final", df_solve=True)
    assert fr2.df_solve is False


def test_fused_two_phase_powerup(clipper_ref):
    """powerup="safe": first ``powerup_samples`` of a fresh-state run go
    through the conservative sibling config, then the state is handed to
    the fast config -- output must be seamless across the boundary and a
    chained run must use the fast path only."""
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True, compensated=False,
                     fast_iters=1, powerup="safe", powerup_samples=128)
    y, st, info = fr.run(u[:, :256], np.zeros((128, 0)))
    assert np.asarray(y).shape[2] == 256
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :256]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100
    # chained run: fast config continues from the carried state
    y2, st, _ = fr.run(u[:, 256:], np.zeros((128, 0)), state=st)
    err2 = np.max(np.abs(np.asarray(y2)[0, 0] - y64[0, 256:]))
    assert 20 * np.log10(err2 / np.max(np.abs(y64))) < -100


def test_fused_two_phase_short_run(clipper_ref):
    """Fresh run shorter than powerup_samples: entirely the safe config."""
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True, compensated=False,
                     fast_iters=1, powerup="safe", powerup_samples=512)
    y, st, info = fr.run(u[:, :128], np.zeros((128, 0)))
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :128]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_powerup_unknown_override_rejected():
    fr = FusedRunner(M.diodeclipper_model(), interpret=True,
                     compensated=False, powerup=dict(bogus=1))
    with pytest.raises(ValueError, match="unknown powerup override"):
        fr._powerup_runner()


def test_fused_polish_fixed(clipper_ref):
    """polish_fixed: unrolled masked polish steps instead of the
    early-exit while loop; same answer."""
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True, polish_fixed=3)
    y, st, info = fr.run(u[:, :128], np.zeros((128, 0)))
    assert int(np.asarray(info.fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :128]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100

def test_fused_plain_final_polish(clipper_ref):
    """df_polish='plain_final': plain-f32 polish loop + one full-df
    evaluation/step per sample (the fastest full-parity configuration)."""
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True,
                     df_polish="plain_final")
    y, st, info = fr.run(u[:, :128], np.zeros((128, 0)))
    assert int(np.asarray(info.fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :128]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_two_phase_extrapolating_handoff(clipper_ref):
    """The safe phase runs with extrapolate=False; the steady config
    extrapolates.  The handed-over state must carry a FRESH wp origin and
    a valid dzdp (regression: the non-extrapolating kernel used to leave
    wp at its initial value and dzdp_out uninitialized, so the fast
    config's first extrapolated warm start was garbage and every sample
    after the handoff failed)."""
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True, fast_iters=1,
                     powerup="safe", powerup_samples=128)
    y, st, info = fr.run(u[:, :256], np.zeros((128, 0)))
    assert int(np.asarray(info.fails).max()) == 0
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :256]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


@pytest.mark.parametrize("mode", ["group", "merge", "always"])
def test_fused_fast_verify_modes(clipper_ref, mode):
    """All three fast-path verification policies give full-parity output
    on a clean run."""
    u, y64 = clipper_ref
    fr = FusedRunner(M.diodeclipper_model(), newton_iters=12, tol=1e-9,
                     time_chunk=128, interpret=True, fast_iters=1,
                     fast_verify=mode)
    y, st, info = fr.run(u[:, :128], np.zeros((128, 0)))
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :128]))
    assert 20 * np.log10(err / np.max(np.abs(y64))) < -100


def test_fused_fast_verify_rejected():
    with pytest.raises(ValueError, match="fast_verify"):
        FusedRunner(M.diodeclipper_model(), interpret=True,
                    compensated=False, fast_verify="bogus")


def test_df_solve_resolves_cond_spike_systems():
    """_solve_rows(xp=dfmath) must resolve the near-null direction of an
    ill-conditioned system that a float32 solve leaves undetermined (the
    residual-invisible z error at pot end-stops).  At cond 1e8 the f32
    relative error is O(1); the double-float elimination must stay below
    1e-5 (cond * eps_df ~ 1e8 * 1e-15, with headroom).  Reference gets
    this for free in f64 (solvers.jl:46-132)."""
    import jax.numpy as jnp

    from acme_tpu.ops import dfmath as dfm
    from acme_tpu.ops.fused import _solve_rows

    rng = np.random.default_rng(7)
    for n in (2, 3, 5):
        for cond in (1e6, 1e8):
            U, _ = np.linalg.qr(rng.normal(size=(n, n)))
            V, _ = np.linalg.qr(rng.normal(size=(n, n)))
            svals = np.logspace(0, -np.log10(cond), n)
            A = ((U * svals) @ V.T).astype(np.float32).astype(np.float64)
            x_true = rng.normal(size=n)
            b = A @ x_true
            x_ref = np.linalg.solve(A, b)
            b_hi = b.astype(np.float32)
            b_lo = (b - b_hi).astype(np.float32)
            blk = lambda v: jnp.full((1, 128), np.float32(v))
            Jdf = [[dfm.DF(blk(A[i, j])) for j in range(n)]
                   for i in range(n)]
            Rdf = [[dfm.DF(blk(b_hi[i]), blk(b_lo[i])) for i in range(n)]]
            Xdf = _solve_rows(Jdf, Rdf, refine=0, pivot=True, xp=dfm)
            nrm = max(abs(x_ref).max(), 1e-30)
            err = max(abs(float(np.asarray(Xdf[0][i].hi, np.float64)[0, 0])
                          + float(np.asarray(Xdf[0][i].lo,
                                             np.float64)[0, 0])
                          - x_ref[i]) for i in range(n)) / nrm
            assert err < 1e-5, (n, cond, err)


@pytest.mark.slow
def test_fused_df_solve_wiring(clipper_ref):
    """df_solve=True end-to-end through the kernel (interpret; the df
    elimination is interpret-hostile, so tiny T)."""
    u, y64 = clipper_ref
    T = 64
    fr = FusedRunner(M.diodeclipper_model(), time_chunk=32,
                     newton_iters=12, tol=1e-9, interpret=True,
                     df_polish="plain_final", df_solve=True)
    y, st, info = fr.run(u[:, :T], np.zeros((128, 0)))
    err = np.max(np.abs(np.asarray(y)[0, 0] - y64[0, :T]))
    ref = np.max(np.abs(y64))
    assert 20 * np.log10(err / ref) < -100
    assert int(np.asarray(info.fails).sum()) == 0


def test_fused_acceptance_guards(clipper_ref):
    """Round-5 soundness guards on the above-gate (floor-stall) acceptance
    and the extrapolated warm start, pinned by the circuit that exposed
    them: an ideal current source driving a lone diode.

    * Small REVERSE current (-1e-5 A, beyond saturation): no root, flat
      residual ~1e-5 -- small enough for the 1e3*gate stall ceiling, so
      only the z-plausibility guard stands between this and a silent
      acceptance while z walks out of the physical range.  Must stay a
      FAIL (reference warn path, ACME.jl:688-691), floored == 0, output
      finite (zw substitution).
    * FORWARD 1 A: a root exists at v = 0.691.  Round 4 'passed' this
      with z = 2.5e10 -- the extrapolated warm start jumped res/J ~ 1e10
      off the operating point and the clamped-exponential plateau
      (elements._exp) made the residual constant, which the un-ceilinged
      floor-stall latch then self-certified.  With the jump capped at one
      trust region and the latch ceilinged, the kernel must now actually
      CONVERGE to the host's answer with zero fails and zero floored."""
    circ = A.Circuit()
    circ.add("d", A.diode())
    circ.add("src", A.currentsource())
    circ.connect(("src", "+"), ("d", "+"))
    circ.connect(("src", "-"), ("d", "-"))
    circ.add("probe", A.voltageprobe())
    circ.connect(("probe", "+"), ("d", "+"))
    circ.connect(("probe", "-"), ("d", "-"))
    fr = FusedRunner(A.DiscreteModel(circ, 1), newton_iters=8,
                     interpret=True, time_chunk=8)
    u = np.full((1, 4), -1e-5)
    with pytest.warns(UserWarning, match="missed the acceptance gate"):
        y, st, info = fr.run(u, np.zeros((128, 0)))
    assert np.all(np.isfinite(np.asarray(y)))
    assert int(np.asarray(info.fails).min()) >= 1
    assert int(np.asarray(info.floored).max()) == 0
    # forward drive: true convergence to the host solution (production
    # Newton depth -- the capped extrapolated start leaves a long
    # sub-knee crawl on this zero-impedance drive, see
    # test_fused_nonconvergence_fail_counter)
    fr2 = FusedRunner(A.DiscreteModel(circ, 1), newton_iters=192,
                      interpret=True, time_chunk=8)
    y2, st2, info2 = fr2.run(np.ones((1, 4)), np.zeros((128, 0)))
    assert int(np.asarray(info2.fails).max()) == 0
    assert int(np.asarray(info2.floored).max()) == 0
    mh = A.DiscreteModel(circ, 1)
    yh = A.run(mh, np.ones((1, 4)))
    assert np.allclose(np.asarray(y2)[0, 0], yh[0], atol=1e-5)
