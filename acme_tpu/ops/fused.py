"""Fused Pallas time-loop kernel: the whole run loop in one TPU kernel.

The lax.scan runtime (acme_tpu.engine) pays a fixed per-sample overhead
(XLA While iteration + small-op dispatch) that caps the real-time factor
regardless of lane count.  This kernel removes it: the complete per-sample
pipeline of the reference's step! (/root/reference/src/ACME.jl:666-715) --
ordered subsystem Newton solves, output row, state update -- runs inside a
single pallas_call, with

  * lanes laid out as (S, 128) vector blocks (S = lanes/128) so every
    arithmetic op is a full-width VPU op;
  * model coefficients baked into the instruction stream as immediates
    (compile-time Python floats -- no memory traffic for coefficients);
  * state, Newton warm starts and convergence counters resident in VMEM
    scratch across a time-chunk grid (TPU grid steps run sequentially, so
    scratch persists);
  * the reference's first-order extrapolated warm start carried in the
    kernel state: z0 = z_w + dz/dp (p - p_w), with (p_w, z_w, dz/dp)
    updated only on converged, non-singular solves (solvers.jl:183-234);
    this replaces both the extrapolation origin and the k-d-tree cache
    (SURVEY.md section 7);
  * early-exit masked Newton: a lax.while_loop that stops when every lane
    converged or stagnated at the float32 rounding floor; a rescue pass
    restarts failed lanes from the operating point;
  * shared time-series inputs read as scalars from SMEM; per-lane constant
    inputs (pot positions: the sweep axis) as VMEM vectors;
  * operating-point centering: all supply-bias arithmetic is performed once
    in float64 at compile time; the runtime float32 carries deviations only
    (without this, bias-scale cancellation caps accuracy around -50 dB).

Accuracy: float32 fast path; use the float64 scan engine for strict parity.
Mosaic constraints honoured here: no i1 vectors through scf.while (masks
travel as f32), no zero-sized vectors, no 64-bit scalars (traced under
jax.enable_x64(False)), SMEM blocks 8-aligned (time axis padded, padded
samples masked so they cannot advance the state).
"""

from __future__ import annotations

import warnings
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dfmath as dfm

__all__ = ["FusedRunner", "FusedInfo", "enable_compile_cache"]

LANE = 128


def enable_compile_cache(path: str = None):
    """Point JAX's persistent compilation cache at ``path`` (default
    ``~/.cache/acme_tpu/jax``) so a process restart reuses the compiled
    kernel instead of paying the full XLA/Mosaic compile again -- the TPU
    analog of the reference's precompile directives
    (/root/reference/src/ACME.jl:779-816).  Idempotent; respects a cache dir
    the application already configured."""
    import os
    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    if path is None:
        path = os.environ.get(
            "ACME_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "acme_tpu", "jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every kernel regardless of size/compile time: the fused kernel
    # is one big program per (model, shapes) configuration
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


class FusedInfo(NamedTuple):
    """Per-lane run statistics from the fused kernel.

    ``fails``: (L,) int32, samples on which any subsystem missed its
    acceptance gate (the reference's warn path, ACME.jl:688-694).
    ``iters``: (L, nsub) int32, total Newton iterations per subsystem over
    the run (the reference's needediterations counters, solvers.jl:205).
    ``floored``: (L,) int32, samples ACCEPTED above the gate via the
    polish floor-stall latch (non-contracting unclipped steps at the f32
    evaluation floor, ceilinged at 1e3x the gate and guarded by z
    plausibility): the best point this precision admits.  Counted
    separately so floor acceptance never hides how often it happens;
    accuracy on such samples is bounded by the parity checks, not the
    gate.  (The reference warns per sample at such operating points,
    ACME.jl:688-691.)
    """
    fails: "jnp.ndarray"
    iters: "jnp.ndarray"
    floored: "jnp.ndarray" = None


def _f(x):
    return float(x)


def _recip_safe(v):
    return jnp.where(v > 0, 1.0 / jnp.where(v > 0, v, 1.0), jnp.ones_like(v))



# -- double-float (compensated) arithmetic helpers ---------------------------
# The Newton residual of stiff subsystems cancels catastrophically in
# float32: q components are O(1) absolute while the converged residual is
# ~1e-10.  We therefore carry q as an unevaluated (hi, lo) float32 pair --
# built with error-free transforms (TwoSum / Dekker TwoProd, no FMA
# required) -- evaluate the element physics at q_hi, and add the
# first-order correction res += Jq @ q_lo.  This drops the residual floor
# by ~2 orders of magnitude at ~2x evaluation cost, without touching the
# element functions (their Jacobians are already available).


def _two_sum(a, b):
    sm = a + b
    bb = sm - a
    err = (a - (sm - bb)) + (b - bb)
    return sm, err


def _split_rt(a):
    """Dekker split of a runtime float32 vector (4 ops)."""
    c = 4097.0 * a
    hi = c - (c - a)
    return hi, a - hi


def _const_split(c):
    """Compile-time split of a float64 coefficient: returns
    (a, ah, al, rem) with a = float32(c), (ah, al) its Dekker split and
    rem = float32(c - a) the truncation remainder."""
    a = np.float32(c)
    t = np.float32(np.float32(4097.0) * a)
    ah = np.float32(t - np.float32(t - a))
    al = np.float32(a - ah)
    rem = np.float32(float(c) - float(a))
    return float(a), float(ah), float(al), float(rem)


def _prod_const(cs, v, vh, vl):
    """Error-free product of a pre-split constant with a pre-split runtime
    vector, plus the constant's f64 truncation remainder."""
    a, ah, al, rem = cs
    pr = a * v
    err = ((ah * vh - pr) + ah * vl + al * vh) + al * vl
    if rem != 0.0:
        err = err + rem * v
    return pr, err


class _Var:
    """Per-lane-varying coefficient: index into the runtime (hi, lo)
    coefficient tables (multi-model FusedRunner)."""
    __slots__ = ("i",)

    def __init__(self, i):
        self.i = i

    def __repr__(self):
        return f"_Var({self.i})"


def _solve_rows(J, R, refine=1, pivot=True, xp=jnp):
    """Solve the per-lane dense systems J X = R where J is a list of lists of
    (S,128) vectors and R is a list of right-hand sides (each a list of n
    vectors); one tiny system per lane, vectorized over lanes.

    Raw Newton Jacobians here reach condition numbers ~1e8 purely from unit
    disparity (junction conductances 1e-10..1e2 against unit voltage rows),
    unsolvable in float32 (cond * eps > 1).  Row/column inf-norm
    equilibration brings that to ~1e4-1e5; f32 elimination (optionally with
    per-lane partial pivoting) plus ``refine`` iterative-refinement steps
    then gives directions good to ~1e-4 relative, ample for Newton, with
    final accuracy set by the residual evaluation.  The reference gets this
    for free by solving in f64 (solvers.jl:46-132).

    ``pivot=False`` skips the where-select pivot cascade (a large fraction
    of elimination cost on the VPU); equilibrated audio-circuit Jacobians
    are diagonally usable in practice, and a bad direction only costs Newton
    an extra iteration -- lanes where it ever fails are caught by the
    residual gate and retried on the pivoted rescue path.

    n==1,2: closed form.  n>=3: Gaussian elimination vectorized over lanes.

    ``xp=dfmath`` runs the identical elimination on double-float (hi, lo)
    entries (all operands must be DF): ~1e-14 effective epsilon, which is
    what resolves the near-null direction of a cond-spike Jacobian that a
    float32 solve leaves undetermined (for n == 2 the failure is exactly
    the catastrophic cancellation in det = ad - bc, which the two_prod
    EFT computes exactly).  Used for the final verdict step when
    ``df_solve`` is enabled."""
    n = len(J)
    m = len(R)
    if n == 1:
        inv = 1.0 / J[0][0]
        return [[R[j][0] * inv] for j in range(m)]
    if n == 2:
        det = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        inv = 1.0 / det
        return [[(R[j][0] * J[1][1] - R[j][1] * J[0][1]) * inv,
                 (R[j][1] * J[0][0] - R[j][0] * J[1][0]) * inv]
                for j in range(m)]

    df = xp is not jnp
    ab = (lambda v: jnp.abs(v.hi + v.lo)) if df else jnp.abs
    rs = []
    for i in range(n):
        mx = ab(J[i][0])
        for jj in range(1, n):
            mx = jnp.maximum(mx, ab(J[i][jj]))
        rs.append(_recip_safe(mx))
    Jr = [[J[i][jj] * rs[i] for jj in range(n)] for i in range(n)]
    cs = []
    for jj in range(n):
        mx = ab(Jr[0][jj])
        for i in range(1, n):
            mx = jnp.maximum(mx, ab(Jr[i][jj]))
        cs.append(_recip_safe(mx))
    Js = [[Jr[i][jj] * cs[jj] for jj in range(n)] for i in range(n)]
    Rs = [[R[j][i] * rs[i] for i in range(n)] for j in range(m)]
    Y = _solve_raw(Js, Rs, pivot, xp=xp)
    X = [[Y[j][jj] * cs[jj] for jj in range(n)] for j in range(m)]
    for _ in range(refine):
        R2 = []
        for j in range(m):
            r2 = []
            for i in range(n):
                acc = R[j][i]
                for jj in range(n):
                    acc = acc - J[i][jj] * X[j][jj]
                r2.append(acc * rs[i])
            R2.append(r2)
        E = _solve_raw(Js, R2, pivot, xp=xp)
        X = [[X[j][jj] + E[j][jj] * cs[jj] for jj in range(n)]
             for j in range(m)]
    return X


def _solve_raw(J, R, pivot=True, xp=jnp):
    """Elimination on vector rows; J (n x n), R list of m RHS.  With
    ``pivot`` each step swaps in the max-|column| row per lane via
    where-selects (branch-free); without, plain diagonal elimination.
    ``xp`` selects the arithmetic (jnp float32 or dfmath double-float)."""
    n = len(J)
    m = len(R)
    df = xp is not jnp
    ab = (lambda v: jnp.abs(v.hi + v.lo)) if df else jnp.abs
    A = [J[i][:] + [R[j][i] for j in range(m)] for i in range(n)]
    w = n + m
    for k in range(n):
        if pivot:
            best = A[k]
            best_abs = ab(A[k][k])
            for i in range(k + 1, n):
                cand_abs = ab(A[i][k])
                take = cand_abs > best_abs
                new_best = [xp.where(take, A[i][c], best[c])
                            for c in range(w)]
                A[i] = [xp.where(take, best[c], A[i][c]) for c in range(w)]
                best = new_best
                best_abs = jnp.maximum(cand_abs, best_abs)
            A[k] = best
        inv = 1.0 / A[k][k]
        for i in range(k + 1, n):
            fct = A[i][k] * inv
            tail = [A[i][c] - fct * A[k][c] for c in range(k, w)]
            A[i] = [xp.zeros_like(fct)] * k + tail
    X = [[None] * n for _ in range(m)]
    for i in range(n - 1, -1, -1):
        inv = 1.0 / A[i][i]
        for j in range(m):
            acc = A[i][n + j]
            for c in range(i + 1, n):
                acc = acc - A[i][c] * X[j][c]
            X[j][i] = acc * inv
    return X


@jax.jit
def _fused_finite_fails(y, fails):
    """Device-side reduction for the user-level failure check: two scalars
    instead of the full (L, ny, T) output (engine.py _finite_conv)."""
    return jnp.all(jnp.isfinite(y)), fails.sum()


class FusedRunner:
    """Compile a DiscreteModel into a fused Pallas sweep runner.

    run(u_time (nu_t, T), lane_values (L, nu_l), state=None)
      -> (y (L, ny, T), state, fail_counts (L,))

    Inputs listed in ``lane_input_idx`` come from per-lane constants (the
    sweep axis); the rest from the shared time series.  L must be a multiple
    of 128.
    """

    def __init__(self, model, lane_input_idx: Sequence[int] = (), *,
                 lane_scale_idx: Sequence[int] = (),
                 newton_iters: int = 192, tol: float = 1e-9,
                 step_clip: float = 1.0, time_chunk: int = 256,
                 interpret: bool = False, center: bool = True,
                 center_u=None, extrapolate: bool = True, refine: int = 1,
                 compensated: bool = True, df_state: bool = True,
                 rel_tol: float = None, rel_gate: float = None,
                 rel_tol_polish: float = None, polish_iters: int = 10,
                 polish_fixed: int = 0,
                 df_polish: bool = True, df_solve="auto",
                 verdict_jac: str = "df", verdict_refine: int = None,
                 pivot: bool = True, group_lanes: int = 2048,
                 fast_iters: int = 0, fast_verify: str = "group",
                 polish_only: bool = False,
                 fast_keep: str = "gate", stall_strikes: int = 2,
                 plateau_strikes: int = 6, compile_cache: bool = True,
                 powerup=None, powerup_samples: int = 4096,
                 mesh=None, mesh_axis: str = "dp"):
        if compile_cache and not interpret:
            enable_compile_cache()
        # multi-chip: lanes are embarrassingly parallel (SURVEY.md 2.3), so
        # the fused kernel shards as a jax.shard_map of the pallas_call
        # along the lane-group axis -- each device runs its own grid over
        # its local lane groups; no collectives anywhere.  ``mesh`` is a
        # 1-D jax.sharding.Mesh (e.g. acme_tpu.parallel.lane_mesh()).
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # per-lane model matrices (the fused analog of
        # engine.BatchCompiledModel): pass a LIST of same-topology models
        # and every coefficient that differs between them becomes a
        # VMEM-resident per-lane (hi, lo) table instead of an
        # instruction-stream immediate; identical coefficients stay
        # immediates, so the kernel cost grows only with what actually
        # varies.  Lane i runs models[i % len(models)].
        models = list(model) if isinstance(model, (list, tuple)) else [model]
        m0 = models[0]
        for m in models[1:]:
            if (m.nx, m.nu, m.ny, m.nsubsystems) != \
                    (m0.nx, m0.nu, m0.ny, m0.nsubsystems) or any(
                    (m.nn(k), m.np(k)) != (m0.nn(k), m0.np(k))
                    for k in range(m0.nsubsystems)):
                raise ValueError(
                    "per-lane models must share dimensions/decomposition")
        self.models = models
        self.model = model = m0
        self.K = int(newton_iters)
        # unguarded fast path: this many plain Newton steps per sample with
        # no convergence bookkeeping; the polish residual verifies them and
        # failing lanes fall back to the gated while-loop.  0 disables
        # (default: the blind steps trade ~15 dB of parity for ~20% speed).
        self.fast_iters = int(fast_iters)
        # polish_only: enter the fast path with ZERO unguarded steps --
        # the extrapolated warm start goes straight into the polish, whose
        # mandatory first step doubles as the sample's one Newton step and
        # whose residual is the verification (failing lanes redo the
        # robust path exactly as with fast_iters > 0).  One plain
        # evaluation cheaper per sample than fast_iters=1; viable when the
        # warm start is already near the solution (steady-state chained
        # runs with extrapolation).
        self.polish_only = bool(polish_only)
        # fast-path verification policy when any lane fails the loose gate:
        #   "group": re-run the robust path for the whole group and keep
        #            its result for every lane (round-2 behavior);
        #   "merge": re-run the robust path but keep the redone result only
        #            for lanes that failed the gate;
        #   "always": unconditionally run the robust path every sample
        #             (debug/diagnosis: removes the group-composition
        #             coupling entirely at full cost).
        if fast_verify not in ("group", "merge", "always"):
            raise ValueError(f"fast_verify must be group|merge|always, "
                             f"got {fast_verify!r}")
        self.fast_verify = fast_verify
        # fast-path pass threshold: "gate" = acceptance gate; "tol" = the
        # polish target tolerance (tight -- use with polish_fixed so
        # small-signal lanes keep full relative parity; lanes above it
        # fall into the redo)
        if fast_keep not in ("gate", "tol"):
            raise ValueError(f"fast_keep must be gate|tol, "
                             f"got {fast_keep!r}")
        self.fast_keep = fast_keep
        # Two-phase power-up: the unguarded fast path and the extrapolated
        # warm start are steady-state optimizations -- during the power-up
        # transient (supply ramp, hard clipping from silence) they can lock
        # onto a wrong Newton root that the polish residual cannot reject
        # (measured: fast_iters=1 gives 3.3x RT but -14 dB power-up parity;
        # extrapolate=True throws hard-clip lanes onto wrong roots in the
        # first window).  ``powerup="safe"`` routes the first
        # ``powerup_samples`` of a fresh-state run() through a sibling
        # runner with the conservative config (no fast path, no
        # extrapolation, full gated loop) and hands its state carry to this
        # runner; chained runs (state != None) always use the fast config.
        # ``powerup`` may also be a dict of config overrides for the
        # sibling.  This mirrors the reference's own "learning phase"
        # semantics (README.md:122-125): the expensive careful solver runs
        # while the trajectory settles, the cheap one after.
        # ``powerup="steady"`` skips the transient altogether: a fresh
        # run() starts every lane at ITS OWN host-computed steady state
        # (steady_initial_state / runtime.steadystate_sweep) -- no
        # power-up window, no learning-phase cost, for constant-pot runs.
        self.powerup_steady = powerup == "steady"
        if self.powerup_steady:
            powerup = None
        if powerup == "safe":
            # strongest verdict tier during the transient: the window is
            # ~powerup_samples of the run, so the full-df verdict's cost
            # is amortized away while the hard-clip samples get the
            # 1e-14-floor residual (a comp_final verdict in the safe
            # window measured -88.8 dB power-up parity at the smallest
            # level lane; full-df holds the -95 dB target)
            # (_powerup_runner degrades df_polish to False when the main
            # runner is not compensated)
            powerup = dict(fast_iters=0, extrapolate="track",
                           polish_only=False, df_polish="final")
        self.powerup_cfg = dict(powerup) if powerup else None
        self.powerup_samples = int(powerup_samples)
        self._pw_runner = None
        # loop exits after this many consecutive stagnant-below-gate
        # iterations (the f32 floor); 2 allows one non-monotone recovery
        self.stall_strikes = int(stall_strikes)
        # loop exits WITH the plat flag (-> rescue tiers) after this many
        # consecutive <0.5%-progress iterations above the gate
        self.plateau_strikes = int(plateau_strikes)
        self.tol = float(tol)
        self.step_clip = float(step_clip)
        self.Tc = int(time_chunk)
        self.interpret = interpret
        # extrapolate: True = use + maintain the extrapolated warm start;
        # "track" = MAINTAIN the (zw, wp, dzdp) origin but start Newton at
        # zw (no extrapolated jump).  The safe power-up runner uses
        # "track": using extrapolation during hard-clip transients was
        # measured to throw lanes onto wrong roots, but NOT maintaining
        # the sensitivity handed a stale dzdp to the fast runner at the
        # two-phase handoff -- a single-sample ~1e-4-relative glitch at
        # t = powerup_samples + 1 (the round-3 bench's -79.9 dB power-up
        # worst, lane 451).  False = neither use nor maintain.
        self.extrapolate = "track" if extrapolate == "track" \
            else bool(extrapolate)
        self.refine = int(refine)
        self.compensated = bool(compensated)
        self.df_state = bool(df_state)
        # main-path solves may skip per-lane pivoting (the where-select
        # cascade is a large share of VPU elimination cost); the rescue
        # path always pivots.  Lane groups of ``group_lanes`` (multiples of
        # 128) are independently launched grid steps: each group's Newton
        # early-exit and rescue trigger see only its own lanes, so one
        # grinding lane stalls at most group_lanes-1 others.  Groups of
        # <= 1024 lanes (8 sublanes x 128 lanes = one vector register per
        # scalar) all cost the same per vector op on the VPU.
        self.pivot = bool(pivot)
        # Mosaic block shapes need the sublane dimension divisible by 8
        # (or equal to the array's), so lane groups below 1024 lanes
        # (Sg < 8) only lower when they cover ALL lanes of the run
        self.group_S = max(1, int(group_lanes) // LANE)
        self.rel_tol = rel_tol
        self.rel_gate = rel_gate
        # the polish loop iterates (compensated residual, refined solve)
        # until the pre-step residual is below max(static comp floor,
        # rel_tol_polish * live term scale), capped at polish_iters.  The
        # residual bound is what limits the z error (scaled by cond(J)), so
        # this is the knob that sets output accuracy on ill-conditioned
        # lanes (pot end-stops, supply transients): 3e-7 -> -50 dB,
        # 3e-8 -> -103 dB measured on the tone=0.05 superover corner.
        self.rel_tol_polish = rel_tol_polish
        self.polish_iters = max(1, int(polish_iters))
        # polish_fixed > 0: exactly that many python-unrolled masked polish
        # steps instead of the early-exiting while loop -- no per-iteration
        # group reduction / scalar branch in the instruction stream, which
        # measures faster whenever the typical polish depth is close to the
        # bound (lanes already at their floor just take masked no-ops)
        self.polish_fixed = max(0, int(polish_fixed))
        # evaluate the polish residual with full double-float element
        # physics (ops/dfmath.py): drops the evaluation noise floor from
        # ~1e-7 to ~1e-14 of the term scale, which is what bounds the z
        # error at cond(J) spikes (pot end-stops, clipping corners).
        # Requires the compensated q pipeline.
        # df_polish: True = every polish eval in full double-float physics;
        # "final" = compensated polish loop + ONE df eval/step at the end
        # (the df-priced arithmetic paid once per sample);
        # "plain_final" = PLAIN-f32 polish loop (cheapest trips, target at
        # the plain evaluation floor ~3e-7 * scale) + the same single df
        # eval/step verdict;
        # "comp_final" = plain-f32 polish loop + ONE COMPENSATED
        # (first-order-corrected) verdict eval/step: ~2x a plain eval
        # instead of ~10x for the full-df verdict (the df Horner exp alone
        # is ~200 VPU ops vs ~15 plain).  Verdict residual floor rises
        # from ~1e-14 to ~1e-9 of the term scale -- measure parity before
        # shipping it on an accuracy-critical sweep;
        # False = comp only
        if df_polish in ("final", "plain_final", "comp_final"):
            self.df_polish = df_polish if self.compensated else False
        else:
            self.df_polish = bool(df_polish) and self.compensated
        # df_solve: the final verdict step's Newton correction solves
        # J dz = res entirely in double-float (Jacobian assembly AND
        # elimination), not just the residual.  This is the only tier
        # that can fix the RESIDUAL-INVISIBLE null-direction z error at
        # cond(J) spikes (pot end-stops): a f32 solve leaves the
        # near-null component of dz undetermined no matter how accurate
        # the residual is.  For nn <= 2 subsystems the df closed form
        # costs ~10 extra df mults per sample; n >= 3 runs the df
        # elimination.
        #
        # "auto" (the default): apply the df verdict solve ONLY to
        # subsystems that are STRUCTURALLY ill-conditioned -- equilibrated
        # cond(J) at the operating point above ~3e3 (sub_fragile, computed
        # below).  The varying-pot superover's pot subsystem sits at
        # equilibrated cond ~1e5-3e5 at EVERY operating point (pot rows
        # mix unit-scale voltage entries with ~1e-7 conductances even
        # after row/col scaling), so its f32-solved verdict step leaves a
        # ~cond*eps32 ~ 1e-2 RELATIVE null-direction z error that the df
        # residual cannot see -- measured as the round-5 pots-grid -36 dB
        # parity wall, gone with the df solve.  Well-conditioned
        # subsystems keep the cheap f32 verdict solve.  Unlike True,
        # "auto" composes with the comp_final verdict tier: fragile
        # subsystems' verdicts are promoted to full-df evaluation + df
        # elimination, the rest stay compensated.
        if df_solve == "auto":
            self.df_solve = "auto" if self.df_polish in (
                True, "final", "plain_final", "comp_final") else False
        else:
            self.df_solve = bool(df_solve) and \
                self.df_polish in (True, "final", "plain_final")
        # verdict_jac="plain": the final df verdict evaluates only the
        # RESIDUAL in double-float physics; the Jacobian of the same point
        # comes from a plain-f32 physics call (whose own residual output is
        # dead code the compiler removes).  Classic mixed-precision
        # iterative refinement: the residual sets the fixed point's
        # accuracy, the Jacobian only the contraction rate, so a ~1e-7
        # relative J is plenty for the one chord step taken here.  XLA
        # then dead-code-eliminates the df-arithmetic Jacobian tail of the
        # element physics (the 4-way BJT case split etc.), which is a
        # material share of the verdict's cost.  Forced to "df" when
        # df_solve needs the df Jacobian for its elimination.
        if verdict_jac not in ("df", "plain"):
            raise ValueError(f"verdict_jac must be df|plain, "
                             f"got {verdict_jac!r}")
        self.verdict_jac = "df" if self.df_solve is True else verdict_jac
        # verdict_refine: iterative-refinement sweeps of the verdict
        # step's elimination (default: the runner-wide ``refine``).  The
        # verdict dz is itself a small correction, so its relative solve
        # error is second-order in the final z -- 0 is safe away from
        # cond(J) spikes and halves the verdict's elimination cost.
        self.verdict_refine = int(refine if verdict_refine is None
                                  else verdict_refine)
        self.lane_idx = tuple(int(i) for i in lane_input_idx)
        # lane-scaled inputs: time-varying rows multiplied by a per-lane
        # constant (e.g. one audio stream fanned out at 4096 input levels)
        self.scale_idx = tuple(int(i) for i in lane_scale_idx)
        self.time_idx = tuple(i for i in range(model.nu)
                              if i not in self.lane_idx)
        self.nx = model.nx
        self.ny = model.ny
        self.nn_total = model.nn()
        self.nsub = model.nsubsystems
        self.np_total = sum(model.np(k) for k in range(self.nsub))
        self.dz_total = sum(model.nn(k) * model.np(k)
                            for k in range(self.nsub))
        self._jit_cache = {}

        # Operating-point centering (see module docstring): deviations around
        # a float64 steady state; exact for ANY center point since the model
        # is affine outside the nonlinearity.
        self.u_ss = np.zeros(model.nu)
        if center_u is not None:
            self.u_ss = np.asarray(center_u, float).copy()
        elif self.lane_idx:
            for i in self.lane_idx:
                self.u_ss[i] = 0.5  # pots at mid travel
        def center_of(m):
            if not (center and (m.nx or self.nn_total)):
                return np.zeros(m.nx), np.zeros(self.nn_total)
            try:
                from ..runtime import steadystate
                return steadystate(m, self.u_ss, return_z=True)
            except Exception:
                # strict (reference-faithful, 1e-15) steady state can fail
                # where the reference's own is broken (singular I - A /
                # unreachable tolerance: chain-decomposed superover,
                # ref test/runtests.jl:763-764).  Centering only needs a
                # point NEAR the trajectory (it is exact for any center),
                # so fall back to the robust run-in operating point.
                try:
                    from ..runtime import operating_point
                    return operating_point(m, self.u_ss)
                except Exception:
                    return np.zeros(m.nx), np.zeros(self.nn_total)

        # Per-model preparation: centering shift + power-of-two state
        # balancing.  State balancing scales are SHARED across models (from
        # models[0]) so the state carries stay comparable lane-to-lane.
        # For a multi-model runner every prepared coefficient is compared
        # across models afterwards: equal ones become compile-time
        # immediates, differing ones per-lane tables.
        self._prep = []
        self.Tx = None
        for m in self.models:
            x_ss, z_ss = center_of(m)
            a = np.asarray(m.a, float)
            b = np.asarray(m.b, float)
            c = np.asarray(m.c, float)
            x0_c = (np.asarray(m.x0, float) + a @ x_ss
                    + b @ self.u_ss + c @ z_ss - x_ss)
            y0_c = (np.asarray(m.y0, float)
                    + np.asarray(m.dy, float) @ x_ss
                    + np.asarray(m.ey, float) @ self.u_ss
                    + np.asarray(m.fy, float) @ z_ss)
            # State balancing: DK states are energy-storage quantities
            # (capacitor charge, inductor flux), numerically ~1e-9 of the
            # voltage scale, so read-out rows like Dy carry coefficients up
            # to ~1e6.  In float32 that cancellation alone caps output
            # accuracy near -60 dB.  Rescale x by per-state powers of two
            # (lossless) so that each state's strongest writer and reader
            # coefficients are comparable:
            #   a -> T^-1 a T,  b,c,x0 -> T^-1 *,  dy,dq -> * T.
            dy = np.asarray(m.dy, float)
            dq_list = [np.asarray(m.dqs[k], float) for k in range(self.nsub)]
            if self.Tx is None:
                self.Tx = self._balance_states(a, b, c, dy, dq_list)
            Tc_ = self.Tx[:, None] if m.nx else np.ones((0, 1))
            Tr_ = self.Tx[None, :] if m.nx else np.ones((1, 0))
            p = dict(
                x_ss=x_ss, z_ss=z_ss,
                a=a * (Tr_ / Tc_) if m.nx else a,
                b=b / Tc_ if m.nx else b,
                c=c / Tc_ if m.nx else c,
                x0=(x0_c / self.Tx if m.nx else x0_c),
                dy=dy * Tr_, ey=np.asarray(m.ey, float),
                fy=np.asarray(m.fy, float), y0=y0_c,
                dq=[d * Tr_ for d in dq_list],
                eq=[np.asarray(m.eqs[k], float) for k in range(self.nsub)],
                fqprev=[np.asarray(m.fqprevs[k], float)
                        for k in range(self.nsub)],
                fq=[np.asarray(m.fqs[k], float) for k in range(self.nsub)],
                pexp=[np.asarray(m.pexps[k], float)
                      for k in range(self.nsub)],
                q0=[], dzdp0=[], tols=[], gates=[])
            off = 0
            for kk in range(self.nsub):
                nn_k, np_k = m.nn(kk), m.np(kk)
                q0 = (np.asarray(m.q0s[kk], float)
                      + np.asarray(m.pexps[kk], float)
                      @ (np.asarray(m.dqs[kk], float) @ x_ss
                         + np.asarray(m.eqs[kk], float) @ self.u_ss
                         + np.asarray(m.fqprevs[kk], float) @ z_ss)
                      + np.asarray(m.fqs[kk], float) @ z_ss[off:off + nn_k])
                p["q0"].append(q0)
                off += nn_k
                # per-subsystem tolerances: the float32 rounding floor of
                # this subsystem's residual differs by orders of magnitude
                # between subsystems (volt-scale pot rows vs mA-scale
                # junction rows).  Estimate it from the term magnitudes
                # |Jq| |q| at the operating point (NOT from res(q0_c),
                # which is only ~0 when the centering steady state is
                # exactly consistent -- for chain-coupled models the
                # reference's own steady state is not, runtests.jl:763).
                # tol = success; gate = "stagnated at the floor, accept";
                # above the gate a lane is flagged non-converged (the
                # reference's warning path).
                floor = float(self._floor_measure(kk, q0[:, None], model=m)
                              .max()) if nn_k else 0.0
                p["tols"].append(max(self.tol, 8.0 * floor))
                p["gates"].append(max(96.0 * floor, 32.0 * self.tol))
                res, Jq = m.nl_funcs[kk](np, q0)
                # initial extrapolation sensitivity at the operating point
                # (solvers.jl:164-178)
                J = Jq @ np.asarray(m.fqs[kk], float)
                Jp = Jq @ np.asarray(m.pexps[kk], float)
                try:
                    d0 = -np.linalg.solve(J, Jp)
                except np.linalg.LinAlgError:
                    d0 = np.zeros((nn_k, np_k))
                p["dzdp0"].append(d0)
            self._prep.append(p)
        p0 = self._prep[0]
        # single-model attribute views (kept: initial_state, tolerances and
        # the kernel builder read these; multi-model variants are resolved
        # per lane)
        self.x_ss, self.z_ss = p0["x_ss"], p0["z_ss"]
        self.x0_c = p0["x0"] * self.Tx if model.nx else p0["x0"]
        self.y0_c = p0["y0"]
        self.a_b, self.b_b, self.c_b = p0["a"], p0["b"], p0["c"]
        self.x0_b, self.dy_b, self.dq_bs = p0["x0"], p0["dy"], p0["dq"]
        self.q0_c = p0["q0"]
        self.tols = [max(p["tols"][k] for p in self._prep)
                     for k in range(self.nsub)]
        self.gates = [max(p["gates"][k] for p in self._prep)
                      for k in range(self.nsub)]
        self.dzdp0 = p0["dzdp0"]
        # Structural conditioning per subsystem (for df_solve="auto"): the
        # EQUILIBRATED condition number of the Newton Jacobian at the
        # operating point.  Row/col inf-norm scaling removes the unit
        # disparity every audio circuit has (junction conductances vs unit
        # voltage rows, cond ~1e8-1e13 raw); what survives equilibration
        # is structural near-degeneracy -- e.g. the variable-pot
        # subsystem's three near-parallel KCL rows distinguished only at
        # the 1e-7-conductance level (equilibrated cond 1e5-3e5 at every
        # operating point).  An f32-solved verdict step contracts the
        # residual-invisible null-direction z error only by
        # ~cond_eq * eps32 per step, so subsystems above ~3e3 need the df
        # elimination to hold -100 dB output parity.
        self.sub_fragile = []
        self.sub_cond_eq = []
        for kk in range(self.nsub):
            ce_max = 0.0
            for m, p in zip(self.models, self._prep):
                nn_k = m.nn(kk)
                if not nn_k:
                    continue
                with np.errstate(all="ignore"):
                    _, Jq0 = m.nl_funcs[kk](np, p["q0"][kk])
                    Je = np.asarray(Jq0 @ np.asarray(m.fqs[kk], float),
                                    float)
                    for _ in range(4):
                        r = np.sqrt(np.abs(Je).max(1))
                        r[(r == 0) | ~np.isfinite(r)] = 1.0
                        Je = Je / r[:, None]
                        c2 = np.sqrt(np.abs(Je).max(0))
                        c2[(c2 == 0) | ~np.isfinite(c2)] = 1.0
                        Je = Je / c2[None, :]
                    try:
                        ce = np.linalg.cond(Je)
                    except np.linalg.LinAlgError:
                        ce = np.inf
                ce_max = max(ce_max, float(ce)) if np.isfinite(ce) \
                    else np.inf
            self.sub_cond_eq.append(ce_max)
            # Threshold 100: the f32 verdict solve leaves a
            # ~cond_eq * eps32 relative null/cancellation error in z
            # (n == 2's closed form: the ad - bc determinant cancellation)
            # -- at cond_eq 1.4e3 that measured 1.6e-4 absolute on the
            # pots superover's output subsystem (-75 dB), while the df
            # closed form for nn <= 2 costs ~10 df mults/sample.  Above
            # 100 the df solve is worth it everywhere.
            self.sub_fragile.append(ce_max > 100.0)
        self._merge_coefficients()

    def _floor_measure(self, kk, q64, comp=None, model=None):
        """Empirical float32 residual floor at the points ``q64`` (nq, L):
        evaluate the element physics in simulated kernel arithmetic (float32,
        optionally with the q_lo first-order compensation) and compare with
        the float64 truth.  This captures exactly the rounding the kernel
        will see, per lane."""
        if comp is None:
            comp = self.compensated
        nl = (model or self.model).nl_funcs[kk]
        res64, _ = nl(np, q64)
        qhi = q64.astype(np.float32)
        res32, Jq32 = nl(np, qhi)
        if comp:
            qlo = (q64 - qhi.astype(np.float64)).astype(np.float32)
            corr = np.einsum("ac...,c...->a...", Jq32, qlo)
            res32 = res32 + corr
        err = np.abs(res32.astype(np.float64) - res64)
        return err.max(axis=0) if err.size else np.zeros(q64.shape[1:])

    def _merge_coefficients(self):
        """Compare every prepared coefficient across the models: equal ones
        stay compile-time immediates (floats), differing ones become _Var
        indices into the per-lane (hi, lo) coefficient tables."""
        preps = self._prep
        n = len(preps)
        var_vals = []

        def mk(get):
            arrs = [np.asarray(get(p), float) for p in preps]
            a0 = arrs[0]
            if n == 1:
                return a0.tolist()
            stack = np.stack(arrs)
            eq = np.all(stack == stack[0:1], axis=0)
            out = np.empty(a0.shape, object)
            for idx in np.ndindex(a0.shape):
                if eq[idx]:
                    out[idx] = float(a0[idx])
                else:
                    out[idx] = _Var(len(var_vals))
                    var_vals.append(stack[(slice(None),) + idx])
            return out.tolist()

        self.P = dict(
            a=mk(lambda p: p["a"]), b=mk(lambda p: p["b"]),
            c=mk(lambda p: p["c"]), x0=mk(lambda p: p["x0"]),
            dy=mk(lambda p: p["dy"]), ey=mk(lambda p: p["ey"]),
            fy=mk(lambda p: p["fy"]), y0=mk(lambda p: p["y0"]),
            subs=[dict(
                dq=mk(lambda p, k=k: p["dq"][k]),
                eq=mk(lambda p, k=k: p["eq"][k]),
                fqprev=mk(lambda p, k=k: p["fqprev"][k]),
                fq=mk(lambda p, k=k: p["fq"][k]),
                pexp=mk(lambda p, k=k: p["pexp"][k]),
                q0=mk(lambda p, k=k: p["q0"][k]))
                for k in range(self.nsub)])
        self.nvar = len(var_vals)
        self.var_tab = (np.stack(var_vals) if var_vals
                        else np.zeros((0, n)))

    def _lane_model_idx(self, L):
        """Lane -> model mapping (cyclic)."""
        return np.arange(L) % len(self.models)

    def _coef_tables(self, S):
        """Per-lane coefficient tables (nvar_m, S, LANE) as (hi, lo) f32."""
        L = S * LANE
        nv = max(self.nvar, 1)
        hi = np.zeros((nv, L), np.float32)
        lo = np.zeros((nv, L), np.float32)
        if self.nvar:
            vals = self.var_tab[:, self._lane_model_idx(L)]  # (nvar, L)
            hi[:self.nvar] = vals.astype(np.float32)
            lo[:self.nvar] = (vals - hi[:self.nvar].astype(np.float64)
                              ).astype(np.float32)
        return hi.reshape(nv, S, LANE), lo.reshape(nv, S, LANE)

    @staticmethod
    def _balance_states(a, b, c, dy, dq_list, sweeps: int = 25):
        """Per-state power-of-two scales equalizing writer and reader
        coefficient magnitudes (LAPACK gebal-style, extended with the b/c
        writer columns and the dy/dq reader rows)."""
        nx = a.shape[0]
        T = np.ones(nx)
        if nx == 0:
            return T
        readers = [dy] + list(dq_list)
        for _ in range(sweeps):
            changed = False
            for j in range(nx):
                outs = [np.abs(a[i, j]) * T[j] / T[i]
                        for i in range(nx) if i != j and a[i, j] != 0]
                outs += [np.abs(r[i, j]) * T[j]
                         for r in readers for i in range(r.shape[0])
                         if r[i, j] != 0]
                ins = [np.abs(a[j, k]) * T[k] / T[j]
                       for k in range(nx) if k != j and a[j, k] != 0]
                ins += [np.abs(v) / T[j]
                        for v in np.concatenate([b[j, :], c[j, :]])
                        if v != 0]
                if not outs or not ins:
                    continue
                f = np.sqrt(max(outs) / max(ins))
                k = int(np.round(np.log2(f)))
                if k != 0:
                    T[j] /= 2.0 ** k
                    changed = True
            if not changed:
                break
        return T

    # -- kernel construction --------------------------------------------------
    def _build(self, S: int, Tc: int, T0: int):
        m = self.model
        nx, ny, nn_total = self.nx, self.ny, self.nn_total
        np_total, dz_total = self.np_total, self.dz_total
        K, step_clip = self.K, self.step_clip
        fast = self.fast_iters
        pol_only = self.polish_only
        vjac = self.verdict_jac
        vrefine = self.verdict_refine
        stall_strikes = float(self.stall_strikes)
        plateau_strikes = float(self.plateau_strikes)
        extrap = bool(self.extrapolate)          # maintain origin/dzdp
        extrap_use = self.extrapolate is True    # use extrapolated starts
        refine = self.refine
        comp = self.compensated
        dfs = self.df_state
        nvar = self.nvar

        def SP(v):
            """Split a coefficient for the compensated dots: compile-time
            Dekker split for immediates, the _Var handle itself for
            per-lane-varying coefficients (split at runtime)."""
            return v if isinstance(v, _Var) else _const_split(v)

        P = self.P
        a, b, c, x0 = P["a"], P["b"], P["c"], P["x0"]
        dy, ey, fy, y0 = P["dy"], P["ey"], P["fy"], P["y0"]
        a_sp = [[SP(v) for v in row] for row in a]
        dy_sp = [[SP(v) for v in row] for row in dy]
        ey_sp = [[SP(v) for v in row] for row in ey]
        fy_sp = [[SP(v) for v in row] for row in fy]
        y0_sp = [SP(v) for v in y0]
        b_sp = [[SP(v) for v in row] for row in b]
        c_sp = [[SP(v) for v in row] for row in c]
        x0_sp = [SP(v) for v in x0]
        subs = []
        zoff = poff = doff = 0
        for kk in range(self.nsub):
            PS = P["subs"][kk]
            fq_m = PS["fq"]
            pexp_m = PS["pexp"]
            q0_m = PS["q0"]
            subs.append(dict(
                dq=PS["dq"], eq=PS["eq"],
                fqprev=PS["fqprev"],
                fq=fq_m, pexp=pexp_m,
                q0=q0_m, nl=m.nl_funcs[kk],
                dq_sp=[[SP(v) for v in row] for row in PS["dq"]],
                eq_sp=[[SP(v) for v in row] for row in PS["eq"]],
                fqprev_sp=[[SP(v) for v in row] for row in PS["fqprev"]],
                fq_sp=[[SP(v) for v in row] for row in fq_m],
                pexp_sp=[[SP(v) for v in row] for row in pexp_m],
                q0_sp=[SP(v) for v in q0_m],
                tol=self.tols[kk], gate=self.gates[kk],
                off=zoff, poff=poff, doff=doff,
                nn=m.nn(kk), np=m.np(kk), nq=m.nq(kk),
                # uniform per-component Newton step bound.  (A q-space
                # scaled variant -- step_clip / max|Fq column| -- was
                # tried and REVERTED: components coupling weakly to q get
                # ~1e4-unit clips, and one giant step at a clipping corner
                # jumps Newton into a different solution basin; the lane
                # then tracks the wrong root indefinitely.  Ref overshoot
                # handling: Newton simply bails, solvers.jl:220-225; we
                # damp instead.)
                zclip=[self.step_clip for _ in range(m.nn(kk))]))
            zoff += m.nn(kk)
            poff += m.np(kk)
            doff += m.nn(kk) * m.np(kk)
        time_idx, lane_idx = self.time_idx, self.lane_idx
        scale_idx = self.scale_idx
        nu_t, nu_l = len(time_idx), len(lane_idx)
        nu_l_total = nu_l + len(scale_idx)

        # Runtime environment for per-lane-varying coefficients: populated
        # at kernel trace time (the tables live in VMEM refs only visible
        # inside the kernel).  env["v"]/env["lo"] are the (hi, lo) vectors,
        # env["sp"] caches runtime Dekker splits per index.
        env = {"v": None, "lo": None, "sp": None}

        def czero(cf):
            """Structurally-zero test: only immediates can be skipped."""
            return (not isinstance(cf, _Var)) and cf == 0.0

        def cval(cf):
            """Runtime value of a coefficient: python float (immediate) or
            the per-lane vector."""
            return env["v"][cf.i] if isinstance(cf, _Var) else _f(cf)

        def vsplit(j):
            # splits are precomputed eagerly at kernel start (outer-trace
            # values): a lazy per-call-site cache would leak tracers
            # between the nested while-loop subtraces
            vh, vl = env["sp"][j]
            return env["v"][j], vh, vl

        def coef_hi_lo(cs):
            """(hi, lo) initializer parts of a split coefficient."""
            if isinstance(cs, _Var):
                return env["v"][cs.i], env["lo"][cs.i]
            return _f(cs[0]), _f(cs[3])

        def prod_coef(cs, v, vh, vl):
            """Error-free coefficient*value product for either coefficient
            kind; returns (product, error, coef_hi)."""
            if isinstance(cs, _Var):
                av, ah, al = vsplit(cs.i)
                pr = av * v
                err = ((ah * vh - pr) + ah * vl + al * vh) + al * vl \
                    + env["lo"][cs.i] * v
                return pr, err, av
            pr, err = _prod_const(cs, v, vh, vl)
            return pr, err, cs[0]

        def dot_df(coef_sp, vals, vlos=None, init=(0.0, 0.0)):
            """Compensated dot product: float64 coefficients (pre-split
            immediates or per-lane tables) times double-float values (hi in
            vals, optional lo in vlos), accumulated with error-free
            transforms.  Returns (hi, lo)."""
            hi, lo = init
            for idx2, cs in enumerate(coef_sp):
                if (not isinstance(cs, _Var)) and cs[0] == 0.0 \
                        and cs[3] == 0.0:
                    continue
                v = vals[idx2]
                if v is None:
                    continue
                v = jnp.asarray(v, jnp.float32)
                vh, vl2 = _split_rt(v)
                pr, err, c0 = prod_coef(cs, v, vh, vl2)
                if vlos is not None and vlos[idx2] is not None:
                    err = err + c0 * vlos[idx2]
                hi, e2 = _two_sum(hi, pr)
                lo = lo + (err + e2)
            return hi, lo

        def dotv(coeffs, vecs, init=None):
            """sum_j coeffs[j]*vecs[j]; immediate coefficients go into the
            instruction stream with structural zeros skipped, per-lane
            coefficients multiply as vectors."""
            acc = init
            for cf, v in zip(coeffs, vecs):
                if czero(cf) or v is None:
                    continue
                term = cval(cf) * v
                acc = term if acc is None else acc + term
            return acc

        pivot = self.pivot
        diag_subfails = getattr(self, "diag_subfails", False)
        diag_failres = getattr(self, "diag_failres", False)
        diag_failmask = getattr(self, "diag_failmask", False)

        def kernel(u_ref, lane_ref, tol_ref, gate_ref, ch_ref, cl_ref,
                   x_in, xlo_in, z_in, zlo_in, zw_in, wp_in, dzdp_in,
                   pmode_in,
                   y_ref, x_out, xlo_out, z_out, zlo_out, zw_out, wp_out,
                   dzdp_out, pmode_out, fail_out, iters_out, floored_out,
                   x_s, xlo_s, z_s, zlo_s, zw_s, wp_s, dzdp_s, pmode_s,
                   fail_s, iters_s, floored_s):
            # grid = (lane groups, time chunks), time fastest: each group
            # runs its whole time axis with state resident in VMEM scratch,
            # then the next group starts (re-initializing from its in-block)
            step_i = pl.program_id(1)

            @pl.when(step_i == 0)
            def _init():
                if nx:
                    x_s[...] = x_in[...]
                    if dfs:
                        xlo_s[...] = xlo_in[...]
                if nn_total:
                    z_s[...] = z_in[...]
                    if dfs:
                        zlo_s[...] = zlo_in[...]
                    zw_s[...] = zw_in[...]
                if np_total:
                    wp_s[...] = wp_in[...]
                if dz_total and extrap:
                    dzdp_s[...] = dzdp_in[...]
                pmode_s[...] = pmode_in[...]
                fail_s[...] = jnp.zeros_like(fail_s)
                iters_s[...] = jnp.zeros_like(iters_s)
                floored_s[...] = jnp.zeros_like(floored_s)

            lane_vals = [lane_ref[j] for j in range(nu_l_total)]
            if nvar:
                env["v"] = [ch_ref[j] for j in range(nvar)]
                env["lo"] = [cl_ref[j] for j in range(nvar)]
                env["sp"] = [_split_rt(v) for v in env["v"]]

            def sample(t, _):
                @pl.when(step_i * Tc + t < T0)
                def _body():
                    _sample_body(t)
                return 0

            def _sample_body(t):
                u_full = [None] * (nu_t + nu_l)
                for jj, gidx in enumerate(time_idx):
                    u_full[gidx] = u_ref[t, jj]
                for jj, gidx in enumerate(lane_idx):
                    u_full[gidx] = lane_vals[jj]
                for jj, gidx in enumerate(scale_idx):
                    u_full[gidx] = u_full[gidx] * lane_vals[nu_l + jj]
                x_v = [x_s[j] for j in range(nx)]
                x_lo = [xlo_s[j] for j in range(nx)] if dfs else None
                # z carried as an unevaluated (hi, lo) pair, like x: the
                # f32 quantization of z alone (~6e-8 |z| ~ 3.6e-7 V on the
                # junction components) feeds the next sample's p and the
                # state update, and the circuit dynamics amplify it into a
                # flat ~-95 dB output floor that NO solver tier could beat
                # (measured: max-accuracy full-df config floors at the
                # same place as the production config).  The lo part is
                # the two_sum remainder of the final verdict step -- exact
                # capture of the representation error at ~zero cost.
                z_all = [z_s[j] for j in range(nn_total)]
                z_lo_all = [zlo_s[j] for j in range(nn_total)] if dfs \
                    else None
                any_fail = None
                any_floor = None
                for ksub, sub in enumerate(subs):
                    nn_k, np_k, nq_k = sub["nn"], sub["np"], sub["nq"]
                    o, po, do = sub["off"], sub["poff"], sub["doff"]
                    # loop tolerance/gate at the plain-f32 floor; final
                    # acceptance gate at the compensated floor
                    ltol_v = tol_ref[ksub]
                    lgate_v = gate_ref[ksub]
                    gate_v = gate_ref[len(subs) + ksub]
                    ptol_v = gate_ref[2 * len(subs) + ksub]
                    zclip = sub["zclip"]
                    # pmode_s[ksub] carries "this lane was accepted via
                    # polish floor-stall last sample" across samples/runs.
                    # Currently diagnostic state only: letting it skip the
                    # cheap loop entirely was tried and REVERTED (mode
                    # chains at steady-state cond spikes drift off the
                    # solution while staying "accepted").
                    # p = Dq x + Eq u + Fqprev z  (ref ACME.jl:681-686)
                    p = []
                    for i in range(np_k):
                        if dfs:
                            nz_row = any(
                                isinstance(cs, _Var)
                                or cs[0] != 0.0 or cs[3] != 0.0
                                for row in (sub["dq_sp"][i], sub["eq_sp"][i],
                                            sub["fqprev_sp"][i])
                                for cs in row)
                            if nz_row:
                                hi, lo = dot_df(sub["dq_sp"][i], x_v, x_lo)
                                hi, lo = dot_df(sub["eq_sp"][i], u_full,
                                                init=(hi, lo))
                                hi, lo = dot_df(sub["fqprev_sp"][i], z_all,
                                                z_lo_all, init=(hi, lo))
                                acc = hi + lo
                            else:
                                acc = None
                        else:
                            acc = dotv(sub["dq"][i], x_v)
                            acc = dotv(sub["eq"][i], u_full, acc)
                            acc = dotv(sub["fqprev"][i], z_all, acc)
                        p.append(acc if acc is not None
                                 else jnp.zeros_like(z_all[o]))
                    if comp:
                        # pfull carried as an unevaluated (hi, lo) pair
                        p_sp = [_split_rt(jnp.asarray(pi, jnp.float32))
                                for pi in p]
                        pfull = []
                        pfull_lo = []
                        for ci in range(nq_k):
                            cs0 = sub["q0_sp"][ci]
                            hi0, lo0 = coef_hi_lo(cs0)
                            hi = jnp.asarray(hi0, jnp.float32)
                            lo = jnp.asarray(lo0, jnp.float32)
                            for i in range(np_k):
                                cs = sub["pexp_sp"][ci][i]
                                if (not isinstance(cs, _Var)) \
                                        and cs[0] == 0.0 and cs[3] == 0.0:
                                    continue
                                pr, err, _ = prod_coef(cs, p[i], *p_sp[i])
                                hi, e2 = _two_sum(hi, pr)
                                lo = lo + (err + e2)
                            pfull.append(hi)
                            pfull_lo.append(lo)
                    else:
                        pfull = []
                        pfull_lo = None
                        for ci in range(nq_k):
                            acc = dotv(sub["pexp"][ci], p)
                            base = cval(sub["q0"][ci])
                            pfull.append(base if acc is None else acc + base)

                    # extrapolated warm start (solvers.jl:209-215).  The
                    # JUMP (dzdp . dp) is bounded to a few Newton trust
                    # regions: near a singular J the sensitivity times a
                    # large dp (power-up step, pot slam) predicts a move
                    # of ~1e10 units that teleports the start outside any
                    # basin -- downstream steps are clipped to zclip per
                    # iteration and can never walk back (measured: ideal
                    # current-source diode, first-sample start at 2.5e10
                    # that round 4 then silently self-certified).  A
                    # legitimate audio-rate extrapolation moves << zclip;
                    # a capped start still lands closer than zw alone.
                    if extrap_use and np_k:
                        dp = [p[i] - wp_s[po + i] for i in range(np_k)]
                        z0 = []
                        for i1 in range(nn_k):
                            acc = None
                            for i2 in range(np_k):
                                term = dzdp_s[do + i1 * np_k + i2] * dp[i2]
                                acc = term if acc is None else acc + term
                            # 4 trust regions: power-up transients move z
                            # by a few units per sample legitimately (a
                            # 1x cap stranded a cold lane permanently);
                            # the pathological jump this guards against
                            # was ~1e10
                            z0.append(zw_s[o + i1] + jnp.clip(
                                acc, -4.0 * zclip[i1], 4.0 * zclip[i1]))
                    else:
                        z0 = [zw_s[o + i1] for i1 in range(nn_k)]
                    z0s = jnp.stack([jnp.broadcast_to(
                        jnp.asarray(zz, jnp.float32), z_all[o].shape)
                        for zz in z0])

                    def eval_at(z, cmode, stats=True, pf=None):
                        """Residual/Jacobian at z.  ``cmode`` selects the
                        compensated (double-float q, first-order residual
                        correction) evaluation; the cheap plain-f32 form
                        drives the Newton loop, the compensated form the
                        final polish step (mixed-precision iterative
                        refinement: intermediate directions only need a few
                        digits, the final step's residual sets accuracy).
                        ``stats=False`` skips the resmax/term-scale
                        reductions (the unguarded fast path needs neither).
                        ``pf`` overrides the sample's pfull (plain mode
                        only) -- the homotopy continuation evaluates at
                        mixed p points along the path."""
                        if pf is not None:
                            q = []
                            q_lo = None
                            for ci in range(nq_k):
                                acc = dotv(sub["fq"][ci], z)
                                q.append(pf[ci] if acc is None
                                         else acc + pf[ci])
                        elif cmode:
                            z_sp = [_split_rt(zz) for zz in z]
                            q = []
                            q_lo = []
                            for ci in range(nq_k):
                                hi = pfull[ci]
                                lo = pfull_lo[ci]
                                for mi in range(nn_k):
                                    cs = sub["fq_sp"][ci][mi]
                                    if (not isinstance(cs, _Var)) \
                                            and cs[0] == 0.0 \
                                            and cs[3] == 0.0:
                                        continue
                                    pr, err, _ = prod_coef(cs, z[mi],
                                                           *z_sp[mi])
                                    hi, e2 = _two_sum(hi, pr)
                                    lo = lo + (err + e2)
                                q.append(hi)
                                q_lo.append(lo)
                        else:
                            q = []
                            q_lo = None
                            for ci in range(nq_k):
                                acc = dotv(sub["fq"][ci], z)
                                q.append(pfull[ci] if acc is None
                                         else acc + pfull[ci])
                        qv = jnp.stack([jnp.broadcast_to(
                            jnp.asarray(qq, jnp.float32), z[0].shape)
                            for qq in q])
                        if cmode == "df":
                            # full double-float physics: the element
                            # functions run unchanged on (hi, lo) pairs,
                            # dropping the residual evaluation floor from
                            # ~1e-7 to ~1e-14 of the internal term scale
                            # (see ops/dfmath.py) -- what bounds the z
                            # error at cond(J) spikes.  Collapsing the df
                            # outputs back to f32 keeps the tiny-residual
                            # accuracy: the rounding is relative to each
                            # row's own (small) value, not to the term
                            # scale.
                            q_lov = jnp.stack([jnp.broadcast_to(
                                jnp.asarray(ql, jnp.float32), z[0].shape)
                                for ql in q_lo])
                            res_df, Jq_df = sub["nl"](dfm, dfm.DF(qv, q_lov))
                            res = res_df.hi + res_df.lo
                            Jq = Jq_df.hi + Jq_df.lo
                        elif cmode == "df_res":
                            # residual-only df verdict (verdict_jac=
                            # "plain"): the df physics call's Jacobian
                            # output and the plain call's residual output
                            # are both dead code XLA eliminates -- what
                            # executes is the df residual tail plus the
                            # plain Jacobian tail over the SHARED plain
                            # subexpressions
                            q_lov = jnp.stack([jnp.broadcast_to(
                                jnp.asarray(ql, jnp.float32), z[0].shape)
                                for ql in q_lo])
                            res_df, _ = sub["nl"](dfm, dfm.DF(qv, q_lov))
                            res = res_df.hi + res_df.lo
                            Jq_df = None
                            _, Jq = sub["nl"](jnp, qv)
                        else:
                            res_df = Jq_df = None
                            res, Jq = sub["nl"](jnp, qv)
                        if cmode and cmode not in ("df", "df_res"):
                            # first-order correction: res(q_hi + q_lo)
                            # ~= res(q_hi) + Jq q_lo
                            corr = []
                            for ai in range(nn_k):
                                acc = res[ai]
                                for ci in range(nq_k):
                                    acc = acc + Jq[ai, ci] * jnp.broadcast_to(
                                        jnp.asarray(q_lo[ci], jnp.float32),
                                        z[0].shape)
                                corr.append(acc)
                            res = jnp.stack(corr)
                        J = [[None] * nn_k for _ in range(nn_k)]
                        for ai in range(nn_k):
                            for bi in range(nn_k):
                                acc = None
                                for ci in range(nq_k):
                                    cf = sub["fq"][ci][bi]
                                    if czero(cf):
                                        continue
                                    term = Jq[ai, ci] * cval(cf)
                                    acc = term if acc is None else acc + term
                                J[ai][bi] = acc if acc is not None \
                                    else jnp.zeros_like(z[0])
                        if df_slv and cmode == "df":
                            # double-float Newton system for the df solve:
                            # J and res kept as (hi, lo) pairs so the
                            # verdict step's elimination resolves the
                            # near-null direction a f32 solve cannot
                            Jd = [[None] * nn_k for _ in range(nn_k)]
                            for ai in range(nn_k):
                                for bi in range(nn_k):
                                    acc = None
                                    for ci in range(nq_k):
                                        cf = sub["fq"][ci][bi]
                                        if czero(cf):
                                            continue
                                        term = Jq_df[ai, ci] * cval(cf)
                                        acc = term if acc is None \
                                            else acc + term
                                    Jd[ai][bi] = acc if acc is not None \
                                        else dfm.DF(jnp.zeros_like(z[0]))
                            dfsys = ([res_df[ai] for ai in range(nn_k)], Jd)
                        else:
                            dfsys = None
                        if not stats:
                            return res, J, Jq, None, None, dfsys
                        resmax = jnp.abs(res[0])
                        for ai in range(1, nn_k):
                            resmax = jnp.maximum(resmax, jnp.abs(res[ai]))
                        # live residual term scale: the float32 floor follows
                        # the magnitudes of the cancelling terms, which swing
                        # with the signal (e.g. pot rows at volt scale).
                        # scale = max_a sum_c |Jq[a,c]| |q_c| tracks it.
                        scale = None
                        for ai in range(nn_k):
                            acc = None
                            for ci in range(nq_k):
                                t2 = jnp.abs(Jq[ai, ci]) * jnp.abs(qv[ci])
                                acc = t2 if acc is None else acc + t2
                            scale = acc if scale is None \
                                else jnp.maximum(scale, acc)
                        return res, J, Jq, resmax, scale, dfsys

                    # Two-tier Newton (mixed-precision iterative refinement):
                    #   1. a cheap loop -- plain-f32 residuals, refine=0
                    #      solves -- iterates until the residual reaches the
                    #      plain-f32 floor (or stagnates for two consecutive
                    #      iterations; 'strikes' allows one non-monotone
                    #      recovery step), or the cap K;
                    #   2. ONE polish step -- compensated residual, refined
                    #       solve -- takes the final Newton step and, in the
                    #      SAME elimination, solves the extrapolation
                    #      sensitivity columns J \ Jp (solvers.jl:200-201).
                    # Intermediate directions only need a few digits; the
                    # final step's residual accuracy sets the answer's, so
                    # the expensive arithmetic is paid once per sample
                    # instead of once per iteration.  The converged flag is
                    # judged on the polish residual (res < gate), mirroring
                    # the reference's warn-but-continue semantics
                    # (ACME.jl:688-694).
                    rel_tol_l = self.rel_tol if self.rel_tol is not None \
                        else 3.0e-7
                    rel_gate_l = self.rel_gate if self.rel_gate is not None \
                        else 4.0e-6
                    rel_gate_f = self.rel_gate if self.rel_gate is not None \
                        else (2.0e-6 if comp else 4.0e-6)
                    df_pol = self.df_polish
                    # per-subsystem verdict-solve precision: True = df
                    # elimination everywhere; "auto" = only for
                    # structurally ill-conditioned subsystems (see
                    # sub_fragile in __init__)
                    df_slv = (self.df_solve is True) or (
                        self.df_solve == "auto"
                        and self.sub_fragile[ksub])
                    comp_final = df_pol == "comp_final"
                    df_final = df_pol in ("final", "plain_final") \
                        or comp_final
                    plain_pol = df_pol in ("plain_final", "comp_final")
                    rel_tol_pol = self.rel_tol_polish \
                        if self.rel_tol_polish is not None \
                        else (3.0e-7 if plain_pol
                              else 3.0e-8 if df_final
                              else 3.0e-9 if df_pol
                              else (3.0e-8 if comp else 3.0e-7))
                    P_pol = self.polish_iters if comp else 1
                    P_fix = self.polish_fixed if comp else 0
                    # "final": the polish LOOP evaluates compensated (cheap,
                    # floor ~1e-7 of scale); ONE full-df evaluation+step at
                    # the polished point then sets the acceptance residual
                    # and the final z -- one df-priced eval per sample
                    # instead of one per polish iteration
                    pol_mode = False if plain_pol else \
                        (comp if df_final else ("df" if df_pol else comp))

                    def make_newton(piv):
                        def newton_iter(zs, prev_resmax, strikes,
                                        strikes_hi):
                            z = [zs[i1] for i1 in range(nn_k)]
                            res, J, _, resmax, scale, _ = eval_at(z, False)
                            # relative tolerances capped at 1e4x their
                            # static anchors (see polish_eval: an uncapped
                            # relative gate self-certifies diverged lanes)
                            tol_eff = jnp.clip(rel_tol_l * scale,
                                               ltol_v, 1e4 * ltol_v)
                            gate_eff = jnp.clip(rel_gate_l * scale,
                                                lgate_v, 1e4 * lgate_v)
                            dz = _solve_rows(
                                J, [[res[ai] for ai in range(nn_k)]],
                                refine=0, pivot=piv)[0]
                            # stagnation: no meaningful progress while
                            # already below the acceptance gate (the float32
                            # floor).  Lanes grinding slowly ABOVE the gate
                            # get their own, more patient counter: after
                            # ``plateau_strikes`` consecutive <0.5%-progress
                            # iterations they exit flagged (plat) and go to
                            # the rescue tiers (homotopy continuation, then
                            # df Newton) instead of burning the full K
                            # budget.  The patience matters: near a clipping
                            # knee Newton can make <0.5% progress for a
                            # couple of unclipped iterations mid-descent,
                            # and bailing there to the POLISH was measured
                            # to track the wrong solution branch -- but the
                            # rescue tiers are branch-safe (path-following /
                            # df-residual), so an early exit to THEM only
                            # costs budget, never the root.
                            stall_any = resmax >= 0.995 * prev_resmax
                            stalled = stall_any & (resmax < gate_eff)
                            strikes = jnp.where(stalled, strikes + 1.0,
                                                jnp.zeros_like(strikes))
                            strikes_hi = jnp.where(
                                stall_any & (resmax >= gate_eff),
                                strikes_hi + 1.0,
                                jnp.zeros_like(strikes_hi))
                            struck = strikes >= stall_strikes
                            plat = strikes_hi >= plateau_strikes
                            done = (resmax < tol_eff) | struck | plat
                            bad = jnp.logical_not(jnp.isfinite(resmax))
                            for ai in range(nn_k):
                                bad = bad | jnp.logical_not(
                                    jnp.isfinite(dz[ai]))
                            move = jnp.logical_not(done | bad)
                            # bounded steps: an overshoot on the junction
                            # exponentials walks back in a few iterations
                            # instead of crawling from multi-volt excursions
                            dz = [jnp.clip(d, -zclip[ai], zclip[ai])
                                  for ai, d in enumerate(dz)]
                            z_new = jnp.stack([
                                jnp.where(move, z[ai] - dz[ai], z[ai])
                                for ai in range(nn_k)])
                            # Mosaic cannot carry i1 vectors through
                            # scf.while: masks travel as float32 0/1
                            return (z_new, done.astype(jnp.float32), resmax,
                                    strikes, strikes_hi, gate_eff,
                                    plat.astype(jnp.float32))

                        def n_cond(st):
                            it, done = st[1], st[2]
                            return jnp.logical_and(
                                it < K, jnp.logical_not(jnp.all(done > 0.5)))

                        def n_body(st):
                            (zs, it, done_prev, prev, strikes, strikes_hi,
                             zlast, rlast, glast, itv, plat) = st
                            (z_new, done, resmax, strikes, strikes_hi,
                             gate_eff, plat_n) = \
                                newton_iter(zs, prev, strikes, strikes_hi)
                            # remember the last *evaluated* iterate per lane
                            # (the loop steps after evaluating; once a lane
                            # is done its z stops moving, so this is its
                            # solution).  Do NOT select by minimum residual
                            # across iterates: for multi-root subsystems a
                            # transient low-residual point near a different
                            # root would hijack the path-following branch.
                            live = done_prev < 0.5
                            zlast = jnp.where(live[None], zs, zlast)
                            rlast = jnp.where(live, resmax, rlast)
                            glast = jnp.where(live, gate_eff, glast)
                            plat = jnp.where(live, plat_n, plat)
                            # per-lane iteration count at which the lane
                            # finished (reference needediterations,
                            # solvers.jl:205); stuck lanes keep K
                            itv = jnp.where(live & (done > 0.5),
                                            (it + 1).astype(jnp.float32),
                                            itv)
                            return (z_new, it + 1, done, resmax, strikes,
                                    strikes_hi, zlast, rlast, glast, itv,
                                    plat)

                        def run(zs0):
                            big = jnp.full(zs0.shape[1:], 3e38, jnp.float32)
                            zero = jnp.zeros(zs0.shape[1:], jnp.float32)
                            out = jax.lax.while_loop(
                                n_cond, n_body,
                                (zs0, jnp.int32(0), zero, big, zero, zero,
                                 zs0, big,
                                 jnp.broadcast_to(lgate_v, zs0.shape[1:]),
                                 jnp.full(zs0.shape[1:], float(K),
                                          jnp.float32), zero))
                            (zlast, rlast, glast, itv, plat) = \
                                (out[6], out[7], out[8], out[9], out[10])
                            return zlast, rlast, glast, itv, plat

                        return run

                    run_newton = make_newton(pivot)

                    def homotopy_rescue(args):
                        """Bisection homotopy continuation for lanes that
                        failed the gated loop (ref HomotopySolver,
                        solvers.jl:268-296) -- masked, fixed-budget form.

                        Path-follows from the last extrapolation origin
                        (wp, zw), where the solution is known: solve at
                        p(a) = wp + a (p - wp), starting at a = 1; on
                        failure bisect a toward the last good point, on
                        success jump back to a = 1.  Unlike the previous
                        restart from the operating point (z = 0),
                        continuation cannot hop to a different solution
                        branch: each solve starts in the basin of the
                        path-continuous root -- restarts were measured to
                        silently land deep-clip lanes on the wrong branch
                        (parity +1.8 dB with zero fails)."""
                        zs0, r0, g0, it0, pl0 = args
                        need = jnp.logical_not(r0 < g0) \
                            | jnp.logical_not(jnp.isfinite(r0))
                        sh0 = r0.shape
                        zg0 = jnp.stack([zw_s[o + i1]
                                         for i1 in range(nn_k)])
                        K2 = 16        # Newton budget per continuation point
                        TRIPS = 6 * K2  # total budget (~6 path points)

                        def h_cond(st):
                            _, _, _, _, _, trips, solved = st
                            live = need & (solved < 0.5)
                            return jnp.logical_and(
                                trips < TRIPS, jnp.any(live))

                        def h_body(st):
                            (z_h, z_good, a_good, a_try, k_in, trips,
                             solved) = st
                            live = need & (solved < 0.5)
                            pmix = [wp_s[po + i2] + a_try
                                    * (p[i2] - wp_s[po + i2])
                                    for i2 in range(np_k)]
                            pf = []
                            for ci in range(nq_k):
                                acc = dotv(sub["pexp"][ci], pmix)
                                base = cval(sub["q0"][ci])
                                pf.append(base if acc is None
                                          else acc + base)
                            zl = [z_h[i1] for i1 in range(nn_k)]
                            res, J, _, resmax, scale, _ = eval_at(
                                zl, False, pf=pf)
                            gate_eff = jnp.clip(rel_gate_l * scale,
                                                lgate_v, 1e4 * lgate_v)
                            ok = resmax < gate_eff
                            dz = _solve_rows(
                                J, [[res[ai] for ai in range(nn_k)]],
                                refine=0, pivot=True)[0]
                            bad = jnp.logical_not(jnp.isfinite(resmax))
                            for ai in range(nn_k):
                                bad = bad | jnp.logical_not(
                                    jnp.isfinite(dz[ai]))
                            move = live & jnp.logical_not(ok | bad)
                            z_new = jnp.stack([
                                jnp.where(move, z_h[ai] - jnp.clip(
                                    dz[ai], -zclip[ai], zclip[ai]),
                                    z_h[ai])
                                for ai in range(nn_k)])
                            commit = live & ok
                            z_good = jnp.where(commit[None], z_h, z_good)
                            a_good = jnp.where(commit, a_try, a_good)
                            solved = jnp.maximum(
                                solved, (commit & (a_try >= 1.0))
                                .astype(jnp.float32))
                            # on success jump back to the full step; on an
                            # exhausted budget bisect toward the last good
                            # point and restart from its solution
                            k_next = jnp.where(commit, 0.0, k_in + 1.0)
                            exh = live & (k_next >= K2) \
                                & jnp.logical_not(ok)
                            a_next = jnp.where(
                                commit, 1.0,
                                jnp.where(exh, 0.5 * (a_good + a_try),
                                          a_try))
                            z_new = jnp.where(exh[None], z_good, z_new)
                            k_next = jnp.where(exh, 0.0, k_next)
                            return (z_new, z_good, a_good, a_next, k_next,
                                    trips + 1, solved)

                        zero0 = jnp.zeros(sh0, jnp.float32)
                        st0 = (zs0, zg0, zero0, jnp.ones(sh0, jnp.float32),
                               zero0, jnp.int32(0), zero0)
                        (z_h, _, _, _, _, trips, solved) = \
                            jax.lax.while_loop(h_cond, h_body, st0)
                        take = need & (solved > 0.5)
                        # the continuation result converged at a = 1, so
                        # report a residual just under the gate; the polish
                        # re-evaluates and sets the final acceptance anyway
                        return (jnp.where(take[None], z_h, zs0),
                                jnp.where(take, 0.5 * g0, r0),
                                g0,
                                it0 + jnp.where(
                                    need, trips.astype(jnp.float32), 0.0),
                                pl0)

                    def df_rescue(args):
                        """Last tier: double-float-residual Newton for
                        lanes the plain-f32 loop and the homotopy both
                        failed.  With df residuals (evaluation floor
                        ~1e-14 of the term scale, ops/dfmath.py) and
                        pivoted refined solves this is effectively the
                        host's float64 solver; it exists for operating
                        points that plain f32 cannot certify at all --
                        one such lane otherwise stays failed for the rest
                        of the run and drags its whole lane group through
                        the full iteration budget every sample."""
                        zs0, r0, g0, it0, pl0 = args
                        need = jnp.logical_not(r0 < g0) \
                            | jnp.logical_not(jnp.isfinite(r0))
                        K3 = 24

                        def d_cond(s):
                            _, rm, k = s
                            return jnp.logical_and(
                                k < K3, jnp.any(need & ~(rm < g0)))

                        def d_body(s):
                            zs_c, _, k = s
                            zl = [zs_c[i1] for i1 in range(nn_k)]
                            res, J, _, resmax, _, _ = eval_at(
                                zl, "df" if df_pol else pol_mode)
                            ok = resmax < g0
                            dz = _solve_rows(
                                J, [[res[ai] for ai in range(nn_k)]],
                                refine=refine, pivot=True)[0]
                            bad = jnp.logical_not(jnp.isfinite(resmax))
                            for ai in range(nn_k):
                                bad = bad | jnp.logical_not(
                                    jnp.isfinite(dz[ai]))
                            move = need & jnp.logical_not(ok | bad)
                            zs_n = jnp.stack([
                                jnp.where(move, zs_c[ai] - jnp.clip(
                                    dz[ai], -zclip[ai], zclip[ai]),
                                    zs_c[ai])
                                for ai in range(nn_k)])
                            return (zs_n, resmax, k + 1)

                        big0 = jnp.full(r0.shape, 3e38, jnp.float32)
                        zs_f, r_f, k_f = jax.lax.while_loop(
                            d_cond, d_body, (zs0, big0, jnp.int32(0)))
                        take = need & ((r_f < r0)
                                       | jnp.logical_not(
                                           jnp.isfinite(r0)))
                        return (jnp.where(take[None], zs_f, zs0),
                                jnp.where(take, r_f, r0), g0,
                                it0 + jnp.where(
                                    need, k_f.astype(jnp.float32), 0.0),
                                pl0)

                    def _all_pass(st):
                        return jnp.all(st[1] < st[2])

                    def full_solve(zs_start):
                        """The robust path: gated Newton while-loop, then
                        homotopy continuation, then a double-float Newton
                        rescue for lanes that still fail."""
                        st = run_newton(zs_start)
                        st = jax.lax.cond(_all_pass(st), lambda a: a,
                                          homotopy_rescue, st)
                        return jax.lax.cond(_all_pass(st), lambda a: a,
                                            df_rescue, st)

                    def polish_eval(zs, mode=None, light=False,
                                    verdict=False):
                        """One compensated evaluation + shared elimination
                        X = J \\ [res | Jp] at zs.  ``light`` drops the
                        sensitivity columns and the solve refinement --
                        used for intermediate loop steps when a df_final
                        eval follows: its columns supersede the loop's
                        (installed whenever it is finite), and
                        intermediate Newton DIRECTIONS only need a few
                        digits, so the np_k extra RHS and the doubled
                        refined solve are pure waste there."""
                        z = [zs[i1] for i1 in range(nn_k)]
                        mode_eff = pol_mode if mode is None else mode
                        (res_c, J, Jq, resmax_c, scale_c,
                         dfsys) = eval_at(z, mode_eff)
                        # relative gates track the live term scale, but
                        # capped at 1e4x their static (operating-point)
                        # anchors: a diverged-but-finite z inflates `scale`
                        # arbitrarily, and an uncapped relative gate then
                        # self-certifies the garbage (measured: one lane's
                        # z grew to ~1e17 and kept "converging")
                        lgate_eff = jnp.clip(rel_gate_l * scale_c,
                                             lgate_v, 1e4 * lgate_v)
                        gate_eff_f = jnp.clip(rel_gate_f * scale_c,
                                              gate_v, 1e4 * gate_v)
                        tol_pol = jnp.clip(rel_tol_pol * scale_c,
                                           ptol_v, 1e4 * ptol_v)
                        # the plain Newton loop's own "done" tolerance at
                        # this point -- the fast path's keep criterion:
                        # the polish's entry contract is "z at the plain
                        # f32 Newton floor" (that is where the gated loop
                        # hands over), NOT merely below the loose gate.
                        # Lanes between the two need real gated Newton
                        # steps first; handing them to the polish alone
                        # strands them mid-descent (the non-contraction
                        # freeze is designed for post-solve refinement)
                        # and the error accumulates sample over sample.
                        ltol_eff = jnp.clip(rel_tol_l * scale_c,
                                            ltol_v, 1e4 * ltol_v)
                        rhs = [[res_c[ai] for ai in range(nn_k)]]
                        if extrap and np_k and not light:
                            for bi in range(np_k):
                                col = []
                                for ai in range(nn_k):
                                    acc = None
                                    for ci in range(nq_k):
                                        cf = sub["pexp"][ci][bi]
                                        if czero(cf):
                                            continue
                                        term = Jq[ai, ci] * cval(cf)
                                        acc = term if acc is None \
                                            else acc + term
                                    col.append(acc if acc is not None
                                               else jnp.zeros_like(z[0]))
                                rhs.append(col)
                        if dfsys is not None:
                            # double-float verdict solve (see df_solve):
                            # df residual AND df Jacobian through a df
                            # elimination; sensitivity columns ride along
                            # (their f32 entries are exact as DF his)
                            res_d, Jd = dfsys
                            rhs_d = [res_d] + [[dfm.DF(cv) for cv in cc]
                                               for cc in rhs[1:]]
                            Xd = _solve_rows(Jd, rhs_d, refine=0,
                                             pivot=True, xp=dfm)
                            X = [[v.value() for v in row] for row in Xd]
                        else:
                            # vrefine applies ONLY to the explicit final
                            # verdict call site (its dz is a small
                            # correction, second-order in the final z) --
                            # NOT to every df-mode polish-loop elimination
                            # (with df_polish=True those take real Newton
                            # steps, where dropping refinement is unsafe)
                            rf = 0 if light else (vrefine if verdict
                                                  else refine)
                            X = _solve_rows(J, rhs, refine=rf, pivot=True)
                        dz = X[0]
                        fin = jnp.isfinite(resmax_c)
                        for ai in range(nn_k):
                            fin = fin & jnp.isfinite(dz[ai])
                        if extrap and np_k and not light:
                            cols = jnp.stack([jnp.stack(X[1 + bi])
                                              for bi in range(np_k)])
                        elif extrap and np_k:
                            # NaN placeholder: if the df_final eval that
                            # normally supersedes these is non-finite, the
                            # |cols| < 1e6 install bound rejects NaN and
                            # the previous sensitivity is kept (installing
                            # zeros would silently degrade the next warm
                            # start)
                            cols = jnp.full((np_k, nn_k) + zs.shape[1:],
                                            jnp.nan, jnp.float32)
                        else:
                            cols = jnp.zeros((1,) + zs.shape[1:],
                                             jnp.float32)
                        return (dz, cols, resmax_c, lgate_eff, gate_eff_f,
                                tol_pol, ltol_eff, fin)

                    def polish_all(zs):
                        """Iterated polish: compensated-residual,
                        refined-solve Newton steps until the (pre-step)
                        residual is below the polish tolerance, at most
                        P_pol of them; every lane takes at least one step
                        (the classic two-tier polish).  Each elimination
                        also refreshes the extrapolation sensitivity
                        J \\ Jp (solvers.jl:200-201).  The extra steps are
                        what finish ill-conditioned lanes (pot end-stops,
                        supply-rail transients) whose plain-f32 loop
                        plateaus above its solve-error floor: the residual
                        bound times cond(J) limits the z error, so the
                        polish tolerance is what sets output accuracy
                        there (tone=0.05 superover corner: -50 dB at
                        3e-7 * scale, -103 dB at 3e-8 * scale).  Returns
                        (z, dzdp cols, last-eval resmax, first-eval resmax,
                        loop gate, final gate, floor-stall flag, eval
                        count)."""
                        sh = zs.shape[1:]
                        big = jnp.full(sh, 3e38, jnp.float32)
                        if extrap and np_k:
                            cols0 = jnp.zeros((np_k, nn_k) + sh, jnp.float32)
                        else:
                            cols0 = jnp.zeros((1,) + sh, jnp.float32)

                        def p_cond(st):
                            _, _, rm, _, _, _, _, tp, pf, _, k = st
                            return jnp.logical_and(
                                k < P_pol,
                                jnp.logical_not(
                                    jnp.all((rm < tp) | (pf > 0.5))))

                        def p_body(st):
                            (zs_c, _, rm_prev, rm1, tl1, _, _, _, pfrz,
                             pstall, k) = st
                            (dz, cols, resmax_c, lgate_eff, gate_eff_f,
                             tol_pol, ltol_eff, fin) = polish_eval(
                                 zs_c, light=df_final)
                            # past the mandatory first step, a lane keeps
                            # stepping only while genuinely contracting
                            # (Newton in its basin contracts far more than
                            # 30% per step; so does a clipped crawl toward
                            # a junction basin, whose residual falls by
                            # e^(clip/vT) per step).  A step that barely
                            # improves the residual is walking z along the
                            # near-null direction of an ill-conditioned J
                            # -- at a cond spike such steps (often at the
                            # full clip) change z materially while the
                            # residual hardly moves, and repeating them
                            # whenever group-mates extend the polish loop
                            # walked marginal lanes into a self-sustaining
                            # grind (measured at 4096 mixed levels; the
                            # same lane is healthy run alone).
                            # (0.95 was tried to let slow spike
                            # convergence continue: it neither improved
                            # the pot-corner ceiling nor kept the sweep
                            # healthy -- marginal lanes ground again)
                            not_contracting = fin \
                                & (resmax_c >= 0.7 * rm_prev)
                            pfrz = jnp.maximum(
                                pfrz, not_contracting.astype(jnp.float32))
                            # floor-stall acceptance: an unclipped step
                            # that failed to contract means the lane is at
                            # its evaluation floor -- nothing below it
                            # exists in this precision, so the caller
                            # counts it converged.  Latched: the freeze
                            # de-activates the lane immediately after, so
                            # a last-state flag would never stick.
                            # CEILINGED at 1e3x the gate (round 5): in a
                            # clamped-exponential plateau (junction driven
                            # volts past any root, elements._exp) the
                            # residual is CONSTANT and the Newton step a
                            # small unclipped vt-crawl -- the latch fired
                            # on residuals of ~1e22 and silently certified
                            # garbage.  A genuine f32 evaluation floor is
                            # within ~1e2 of the gate by construction.
                            unclip = None
                            for ai in range(nn_k):
                                u_i = jnp.abs(dz[ai]) < 0.9 * zclip[ai]
                                unclip = u_i if unclip is None \
                                    else unclip & u_i
                            pstall = jnp.maximum(
                                pstall, (not_contracting & unclip
                                         & (resmax_c >= tol_pol)
                                         & (resmax_c < 1e3 * gate_eff_f))
                                .astype(jnp.float32))
                            # already-converged guard on the mandatory
                            # first step too (round 5): at a cond spike
                            # the "classic free last step" from a point
                            # already below the polish target is a bomb
                            # (J near-singular, dz garbage at full clip);
                            # a lane below tol_pol keeps its z.
                            act = fin & (resmax_c >= tol_pol) \
                                & ((k == 0) | (pfrz < 0.5))
                            zp = jnp.stack([
                                jnp.where(act, zs_c[ai] - jnp.clip(
                                    dz[ai], -zclip[ai], zclip[ai]),
                                    zs_c[ai])
                                for ai in range(nn_k)])
                            rm1 = jnp.where(k == 0, resmax_c, rm1)
                            tl1 = jnp.where(k == 0, ltol_eff, tl1)
                            return (zp, cols, resmax_c, rm1, tl1, lgate_eff,
                                    gate_eff_f, tol_pol, pfrz, pstall,
                                    k + 1)

                        zero = jnp.zeros(sh, jnp.float32)
                        st = (zs, cols0, big, big,
                              jnp.broadcast_to(ltol_v, sh),
                              jnp.broadcast_to(lgate_v, sh),
                              jnp.broadcast_to(gate_v, sh),
                              jnp.broadcast_to(ptol_v, sh), zero, zero,
                              jnp.int32(0))
                        # polish_fixed = an UNROLLED PREFIX of the loop:
                        # the typical steady-state lane finishes inside it
                        # with zero per-iteration group reductions or
                        # scalar branches in the instruction stream; the
                        # while loop then continues for tail lanes only
                        # (its entry test is the single group reduction the
                        # common case pays).  Earlier rounds made P_fix
                        # REPLACE the loop, which stranded the slow tail at
                        # the acceptance gate instead of the polish target:
                        # measured -61.8 dB worst-lane steady parity vs
                        # -94.7 dB with the full loop, at +30% speed --
                        # the prefix+continuation form keeps the accuracy
                        # of the loop at nearly the speed of the fixed form.
                        if P_fix:
                            st_c = st
                            for _ in range(min(P_fix, P_pol)):
                                st_c = p_body(st_c)
                            (zp, cols, rm, rm1, tl1, lg, gf, tp, _, pstall,
                             k) = \
                                jax.lax.while_loop(p_cond, p_body, st_c)
                        else:
                            (zp, cols, rm, rm1, tl1, lg, gf, tp, _, pstall,
                             k) = \
                                jax.lax.while_loop(p_cond, p_body, st)
                        if df_final:
                            # one full-df evaluation at the comp-polished
                            # point: its residual is the acceptance
                            # verdict, its Newton step the final z (the
                            # classic free last step), its elimination the
                            # freshest dz/dp sensitivity
                            # fragile subsystems (df_slv): the verdict is
                            # promoted to full-df evaluation so the df
                            # elimination has the df Jacobian it needs
                            vmode = "df" if df_slv else (
                                True if comp_final else (
                                    "df" if vjac == "df" else "df_res"))
                            def vd_pass(zp, zlo, cols, rm, lg, gf, tp, k):
                                """One verdict pass: df-tier evaluation at
                                zp, guarded final step, bookkeeping
                                install.  Returns the updated state plus
                                the PRE-step residual (the continuation
                                test for the fold loop below)."""
                                (dzf, colsf, rm_df, lgf, gff, tpf, _tl,
                                 finf) = \
                                    polish_eval(zp, mode=vmode,
                                                verdict=True)
                                tp = jnp.where(finf, tpf, tp)
                                # final step via two_sum: hi is the f32
                                # new z, lo the EXACT subtraction
                                # remainder -- the z carry's lo channel
                                # (see z_lo_all above).
                                # Already-converged guard (round 5): the
                                # verdict's free step is skipped for lanes
                                # whose pre-step df residual is already
                                # below the polish target -- at a cond
                                # spike even the refined F32 solve's
                                # direction is garbage, and stepping a
                                # converged lane only poisons it (the
                                # round-4 phase-locked fails).
                                # EXCEPT with the df solve (df_slv): its
                                # step is the exact correction for the
                                # residual-invisible null-direction error
                                # -- which lives BELOW the residual target
                                # by construction -- so it must be applied
                                # precisely when the guard would skip it
                                # (zclip still bounds it).
                                vstep = finf if df_slv \
                                    else finf & (rm_df >= tpf)
                                zp_n, zlo_n = [], []
                                for ai in range(nn_k):
                                    dzc = jnp.clip(dzf[ai], -zclip[ai],
                                                   zclip[ai])
                                    hi2, lo2 = _two_sum(zp[ai], -dzc)
                                    zp_n.append(jnp.where(vstep, hi2,
                                                          zp[ai]))
                                    zlo_n.append(jnp.where(
                                        vstep, lo2, jnp.zeros_like(lo2)))
                                zp = jnp.stack(zp_n)
                                zlo = jnp.stack(zlo_n)
                                rm = jnp.where(finf, rm_df, rm)
                                lg = jnp.where(finf, lgf, lg)
                                gf = jnp.where(finf, gff, gf)
                                cols = jnp.where(
                                    jnp.broadcast_to(finf, cols.shape),
                                    colsf, cols)
                                return (zp, zlo, cols, rm, lg, gf, tp,
                                        k + 1, rm_df)
                            zlo = None
                            (zp, zlo, cols, rm, lg, gf, tp, k,
                             rm_df0) = vd_pass(zp, jnp.zeros_like(zp),
                                               cols, rm, lg, gf, tp, k)
                            if df_slv and self.sub_cond_eq[ksub] > 1e4:
                                # FOLD CONTINUATION.  At the max-slew
                                # cond(J) spikes this subsystem's Jacobian
                                # is near a fold (sigma_min ~ 1e-7 ||J||):
                                # the solution's z error scales as
                                # sqrt(residual) there (measured on the
                                # f64 scan engine: tol 1e-9 -> 5.6e-5,
                                # 1e-10 -> 1.8e-5 output deviation from
                                # the 1e-12 oracle), and Newton converges
                                # LINEARLY (rate ~1/2), so the single
                                # verdict step above leaves a phase-locked
                                # ~1e-4 solution offset no residual gate
                                # can see.  Iterate the df verdict until
                                # the pre-step residual is under a target
                                # deep enough for -100 dB z accuracy
                                # (0.02 x the absolute tolerance anchor ~
                                # 2e-11; the df evaluation floor ~1e-13 x
                                # term scale sits below it), exiting early
                                # when an iteration stops contracting
                                # (floor-stuck lanes).  Ordinary samples
                                # exit immediately: their first-step
                                # residual is already at the df floor.
                                vtgt = jnp.float32(0.02 * self.tol)

                                def v_cond(st):
                                    i_v, rm_prev, *_ = st
                                    go = (rm_prev >= vtgt) \
                                        & jnp.isfinite(rm_prev)
                                    return (i_v < 9) & jnp.any(go)

                                def v_body(st):
                                    (i_v, rm_prev, zp, zlo, cols, rm, lg,
                                     gf, tp, k) = st
                                    (zp2, zlo2, cols2, rm2, lg2, gf2, tp2,
                                     k2, rm_df) = vd_pass(
                                        zp, zlo, cols, rm, lg, gf, tp, k)
                                    # install only for lanes still above
                                    # target AND still contracting
                                    act = (rm_prev >= vtgt) \
                                        & (rm_df <= 0.9 * rm_prev)
                                    pick = lambda a, b: jnp.where(
                                        jnp.broadcast_to(act, a.shape),
                                        a, b)
                                    return (i_v + 1,
                                            jnp.where(act, rm_df,
                                                      jnp.zeros_like(
                                                          rm_df)),
                                            pick(zp2, zp), pick(zlo2, zlo),
                                            pick(cols2, cols),
                                            jnp.where(act, rm2, rm),
                                            jnp.where(act, lg2, lg),
                                            jnp.where(act, gf2, gf),
                                            jnp.where(act, tp2, tp),
                                            jnp.maximum(k, k2))

                                (_, _, zp, zlo, cols, rm, lg, gf, tp,
                                 k) = jax.lax.while_loop(
                                    v_cond, v_body,
                                    (jnp.int32(0), rm_df0, zp, zlo, cols,
                                     rm, lg, gf, tp, k))
                        else:
                            zlo = jnp.zeros_like(zp)
                        return (zp, zlo, cols, rm, rm1, tl1, lg, gf, tp,
                                pstall, k)

                    if fast > 0 or pol_only:
                        # unguarded fast path: ``fast`` plain Newton steps
                        # with no cross-lane reductions -- the polish
                        # residual is the verification.  Lanes it fails
                        # (transients, branch changes) fall into the
                        # robust while-loop path, re-polished after.
                        # (polish_only: zero fast steps -- the extrapolated
                        # start goes straight into the polish, whose
                        # mandatory first step is the sample's Newton step.)
                        #
                        # ALREADY-CONVERGED GUARD (round 5): a lane whose
                        # warm start is already below the lane tolerance
                        # takes NO step.  At a cond(J) spike (measured
                        # 1e10-1e13 on the pots grid at specific swing
                        # phases, _diag_replay.py) the Newton step from a
                        # CONVERGED point is garbage along the near-null
                        # direction -- one blind step threw the iterate
                        # O(1) away and the recovery needs ~15 wandering
                        # iterations no later tier performs; this was the
                        # entire round-4 phase-locked fail population.
                        # The guard is elementwise (per-lane max over the
                        # nn rows): the fast path stays reduction-free.
                        zs_cur = z0s
                        for _ in range(fast):
                            zc = [zs_cur[i1] for i1 in range(nn_k)]
                            res_f, J_f, _, _, _, _ = eval_at(zc, False,
                                                          stats=False)
                            rmf = jnp.abs(res_f[0])
                            for ai in range(1, nn_k):
                                rmf = jnp.maximum(rmf, jnp.abs(res_f[ai]))
                            dzf = _solve_rows(
                                J_f, [[res_f[ai] for ai in range(nn_k)]],
                                refine=0, pivot=pivot)[0]
                            okf = jnp.isfinite(dzf[0])
                            for ai in range(1, nn_k):
                                okf = okf & jnp.isfinite(dzf[ai])
                            okf = okf & (rmf >= ltol_v)
                            zs_cur = jnp.stack([
                                jnp.where(okf, zc[ai] - jnp.clip(
                                    dzf[ai], -zclip[ai], zclip[ai]), zc[ai])
                                for ai in range(nn_k)])
                        (zp, zlo, cols, resmax_c, rm1, tl1, lgate_eff,
                         gate_eff_f, tol_pf, pstall, kp) = \
                            polish_all(zs_cur)
                        itv0 = jnp.full(zp.shape[1:], float(fast),
                                        jnp.float32) \
                            + kp.astype(jnp.float32)
                        # keep criterion: the polish's HONEST verdict.  A
                        # lane passes if its final (compensated/df)
                        # residual is below the acceptance gate, or if it
                        # floor-stalled AFTER entering the polish at the
                        # plain Newton loop's own "done" tolerance (the
                        # robust path's entry contract).  The floor-stall
                        # latch alone is NOT a certificate here: it
                        # declares "nothing below this exists in f32",
                        # which only holds at the floor -- judging the
                        # fast result by it mid-descent was a measured
                        # disaster (lanes in the band between loop
                        # tolerance and gate were accepted stranded, the
                        # per-sample error accumulated until the lane
                        # walked off the solution branch: +dB parity,
                        # periodic fails, with the victim set a function
                        # of group composition only through how often
                        # group-mates triggered the rescuing redo).
                        # Judging by the pre-polish residual alone
                        # (rm1 < tl1) is safe but was measured ~20x too
                        # strict: one unguarded Newton step rarely lands
                        # at the done-tolerance, so nearly every sample
                        # paid the redo and the fast path lost its value.
                        # fast_keep selects the pass threshold: "gate"
                        # accepts at the acceptance gate (matches the
                        # reference's warn semantics); "tol" accepts only
                        # at the polish target tolerance -- the level the
                        # while-loop actually achieves before stopping --
                        # which keeps small-signal lanes (whose own output
                        # is far below the absolute gate anchors) at full
                        # relative parity when the polish trip count is
                        # fixed (polish_fixed > 0)
                        keep_thr = tol_pf if self.fast_keep == "tol" \
                            else gate_eff_f
                        ok1 = (resmax_c < keep_thr) \
                            | ((rm1 < tl1) & (pstall > 0.5))

                        def keep(args):
                            zs_c, zp, zlo, cols, rm, gf, ps, itv = args
                            return zp, zlo, cols, rm, gf, ps, itv

                        def redo(args):
                            (zs_c, zp_k, zlo_k, cols_k, rm_k, gf_k, ps_k,
                             itv) = args
                            zs4, r4, g4, itv4, _ = full_solve(zs_c)
                            (zp2, zlo2, cols2, rm2, _, _, _, gf2, _, ps2,
                             kp2) = polish_all(zs4)
                            if self.fast_verify == "merge":
                                # keep the redone result only for lanes
                                # that failed the keep criterion; passing
                                # lanes' first-polish result is identical
                                # to what the redo would compute (same
                                # entry point, act-masked loop), so the
                                # merge is exact for them
                                need = jnp.logical_not(ok1)
                                return (
                                    jnp.where(jnp.broadcast_to(
                                        need, zp2.shape), zp2, zp_k),
                                    jnp.where(jnp.broadcast_to(
                                        need, zlo2.shape), zlo2, zlo_k),
                                    jnp.where(jnp.broadcast_to(
                                        need, cols2.shape), cols2, cols_k),
                                    jnp.where(need, rm2, rm_k),
                                    jnp.where(need, gf2, gf_k),
                                    jnp.where(need, ps2, ps_k),
                                    itv + jnp.where(
                                        need,
                                        itv4 + kp2.astype(jnp.float32),
                                        0.0))
                            return (zp2, zlo2, cols2, rm2, gf2, ps2,
                                    itv + itv4 + kp2.astype(jnp.float32))

                        if self.fast_verify == "always":
                            (zp, zlo, cols, resmax_c, gate_eff_f, pstall,
                             itv_t) = redo(
                                (zs_cur, zp, zlo, cols, resmax_c,
                                 gate_eff_f, pstall, itv0))
                        else:
                            (zp, zlo, cols, resmax_c, gate_eff_f, pstall,
                             itv_t) = jax.lax.cond(
                                jnp.all(ok1), keep, redo,
                                (zs_cur, zp, zlo, cols, resmax_c,
                                 gate_eff_f, pstall, itv0))
                    else:
                        zs4, r4, g4, itv4, _ = full_solve(z0s)
                        (zp, zlo, cols, resmax_c, _, _, _, gate_eff_f, _,
                         pstall, kp) = polish_all(zs4)
                        itv_t = itv4 + kp.astype(jnp.float32)

                    z = [zp[i1] for i1 in range(nn_k)]

                    # converged = the polish residual passed the acceptance
                    # gate; failures follow the reference's warn path.
                    # Floor-stalled lanes (polish at its own f32 floor on
                    # unclipped steps, or the df-rescue's certified floor)
                    # count as converged -- their answer is the best any
                    # precision admits -- but ONLY at a plausible z: a
                    # runaway lane (flat residual walking z out of the
                    # physical range, e.g. a reverse-driven junction) can
                    # stall small residuals at |z| ~ 1e5 and must stay a
                    # fail (and get the zw substitution below).  A
                    # NON-FINITE verdict residual alone does not block the
                    # stall acceptance: the polish keeps the pre-step z on
                    # non-finite evals (``fin``), so z itself is the last
                    # good floor point even when one df verdict eval
                    # overflowed (measured: hard-driven junction rows).
                    z_implaus = None
                    for i1 in range(nn_k):
                        bad_i = jnp.logical_not(
                            jnp.isfinite(zp[i1])) | (jnp.abs(zp[i1]) > 1e4)
                        z_implaus = bad_i if z_implaus is None \
                            else (z_implaus | bad_i)
                    conv = (resmax_c < gate_eff_f) \
                        | ((pstall > 0.5) & jnp.logical_not(z_implaus))
                    fail_k = jnp.logical_not(conv)
                    implaus = z_implaus | jnp.logical_not(
                        jnp.isfinite(resmax_c))
                    any_fail = fail_k if any_fail is None else (any_fail | fail_k)
                    # floor-accepted: converged via the stall certificate
                    # while the residual sits above the gate -- counted
                    # separately (FusedInfo.floored) so acceptance never
                    # hides how often the dead zone was traversed
                    floor_k = conv & jnp.logical_not(
                        resmax_c < gate_eff_f)
                    any_floor = floor_k if any_floor is None \
                        else (any_floor | floor_k)
                    pmode_s[ksub] = pstall
                    # diag_subfails: repurpose the per-subsystem iteration
                    # counter as a per-subsystem FAIL counter (FusedInfo
                    # carries no per-sub fail breakdown; this trace-time
                    # switch makes "which subsystem misses its gate?"
                    # measurable without a kernel-signature change).
                    # diag_failres: same channel, max over fail samples of
                    # the verdict-residual/gate ratio ("how far above the
                    # gate do failing samples sit?").
                    if diag_failres:
                        ratio = jnp.where(
                            fail_k & jnp.isfinite(resmax_c),
                            jnp.minimum(resmax_c / gate_eff_f, 1e6), 0.0)
                        iters_s[ksub] = jnp.maximum(
                            iters_s[ksub], ratio.astype(jnp.int32))
                    else:
                        iters_s[ksub] = iters_s[ksub] + (
                            fail_k.astype(jnp.int32) if diag_subfails
                            else itv_t.astype(jnp.int32))
                    # plausibility substitution: centered z of an audio
                    # circuit stays within ~1e2; a failed lane carrying
                    # |z| beyond 1e4 (or non-finite; the ``implaus`` mask
                    # above) has diverged, and writing it into the state
                    # poisons x and every later sample.  Substitute the
                    # last good solution (zw) -- the sample stays flagged
                    # and the next one retries from a sane state.
                    zsub = fail_k & implaus
                    for i1 in range(nn_k):
                        z_all[o + i1] = jnp.where(zsub, zw_s[o + i1], z[i1])
                        if dfs:
                            z_lo_all[o + i1] = jnp.where(
                                zsub, jnp.zeros_like(zlo[i1]), zlo[i1])

                    # move the extrapolation origin (solvers.jl:220-234),
                    # in two parts with different trust requirements:
                    #
                    # * the POSITION (zw, wp) follows any finite solution.
                    #   Freezing it on non-accepted samples makes the
                    #   p-distance grow every sample of a hard transient
                    #   and the extrapolated start drifts ever further (a
                    #   measured 192-iters x 2000-samples pathology on the
                    #   varying-pot power-up ramp).  With wp fresh, dp is
                    #   always small, so even a stale sensitivity gives a
                    #   good start.
                    # * the SENSITIVITY (dzdp = -J^-1 Jp) updates only on
                    #   accepted-or-floor-stalled samples AND with every
                    #   entry bounded: near a singular J the polish
                    #   elimination can produce astronomically large but
                    #   *finite* columns (measured 1.8e29), and one such
                    #   install throws the next extrapolated start to
                    #   infinity and NaN-poisons the lane permanently.
                    ok = jnp.logical_not(implaus)
                    if extrap and np_k:
                        okd = ok & conv
                        for bi in range(np_k):
                            for ai in range(nn_k):
                                okd = okd & (jnp.abs(cols[bi, ai]) < 1e6)
                        for i1 in range(nn_k):
                            zw_s[o + i1] = jnp.where(ok, z[i1], zw_s[o + i1])
                        for i2 in range(np_k):
                            wp_s[po + i2] = jnp.where(ok, p[i2], wp_s[po + i2])
                        for i1 in range(nn_k):
                            for i2 in range(np_k):
                                di = do + i1 * np_k + i2
                                dzdp_s[di] = jnp.where(
                                    okd, -cols[i2, i1], dzdp_s[di])
                    else:
                        # keep the position origin (zw, wp) fresh even
                        # without extrapolation: the state may be handed to
                        # an extrapolating sibling runner (two-phase
                        # power-up), and a stale wp would make its first
                        # dp = p - wp huge -- a garbage warm start that
                        # fails every sample after the handoff.
                        for i1 in range(nn_k):
                            zw_s[o + i1] = jnp.where(ok, z[i1], zw_s[o + i1])
                        for i2 in range(np_k):
                            wp_s[po + i2] = jnp.where(ok, p[i2], wp_s[po + i2])

                # output row and state update (ref ACME.jl:699-714).
                # With df_state the state is an unevaluated (hi, lo) pair
                # and the read-outs accumulate with error-free transforms:
                # the near-unity poles of audio circuits otherwise integrate
                # float32 term rounding into an audible error floor.
                for oi in range(ny):
                    if dfs:
                        # EFT readout: the output terms cancel at the
                        # BIAS-RAIL scale (~27 V internally for the chain
                        # superover) while the audio output can be well
                        # under a volt, so plain-f32 term rounding left a
                        # flat ~2e-6 ABSOLUTE output floor (level-sweep
                        # lane 0 measured -94 dB vs -101 dB at lane 4095
                        # -- same absolute error, different scale).
                        # Error-free dots on the (hi, lo) state cost ~15
                        # flops/term on ny rows (~3% of a sample) and
                        # remove that floor.
                        hi, lo = dot_df(dy_sp[oi], x_v, x_lo,
                                        init=coef_hi_lo(y0_sp[oi]))
                        hi, lo = dot_df(ey_sp[oi], u_full, init=(hi, lo))
                        hi, lo = dot_df(fy_sp[oi], z_all, z_lo_all,
                                        init=(hi, lo))
                        val = hi + lo
                    else:
                        acc = dotv(dy[oi], x_v)
                        acc = dotv(ey[oi], u_full, acc)
                        acc = dotv(fy[oi], z_all, acc)
                        val = cval(y0[oi]) if acc is None \
                            else acc + cval(y0[oi])
                    if diag_failmask and oi == 0:
                        # diag_failmask: row 0 of y carries the per-sample
                        # fail mask instead of the output -- the only way
                        # to see WHICH samples fail (FusedInfo only counts)
                        val = any_fail.astype(jnp.float32) \
                            if any_fail is not None else val * 0.0
                    y_ref[t, oi] = jnp.broadcast_to(
                        jnp.asarray(val, jnp.float32), y_ref.shape[2:])
                if dfs:
                    x_new = []
                    for xi in range(nx):
                        hi, lo = dot_df(a_sp[xi], x_v, x_lo,
                                        init=coef_hi_lo(x0_sp[xi]))
                        hi, lo = dot_df(b_sp[xi], u_full, init=(hi, lo))
                        hi, lo = dot_df(c_sp[xi], z_all, z_lo_all,
                                        init=(hi, lo))
                        hi2, lo2 = _two_sum(jnp.asarray(hi, jnp.float32),
                                            jnp.asarray(lo, jnp.float32))
                        x_new.append((hi2, lo2))
                    for xi in range(nx):
                        x_s[xi] = jnp.broadcast_to(
                            jnp.asarray(x_new[xi][0], jnp.float32),
                            x_s.shape[1:])
                        xlo_s[xi] = jnp.broadcast_to(
                            jnp.asarray(x_new[xi][1], jnp.float32),
                            x_s.shape[1:])
                else:
                    x_new = []
                    for xi in range(nx):
                        acc = dotv(a[xi], x_v)
                        acc = dotv(b[xi], u_full, acc)
                        acc = dotv(c[xi], z_all, acc)
                        x_new.append(cval(x0[xi]) if acc is None
                                     else acc + cval(x0[xi]))
                    for xi in range(nx):
                        x_s[xi] = jnp.broadcast_to(
                            jnp.asarray(x_new[xi], jnp.float32),
                            x_s.shape[1:])
                for zi in range(nn_total):
                    z_s[zi] = z_all[zi]
                    if dfs:
                        zlo_s[zi] = z_lo_all[zi]
                if any_fail is not None:
                    fail_s[...] = fail_s[...] + any_fail.astype(jnp.int32)
                    floored_s[...] = floored_s[...] \
                        + any_floor.astype(jnp.int32)

            jax.lax.fori_loop(0, Tc, sample, 0)

            @pl.when(step_i == pl.num_programs(1) - 1)
            def _fin():
                if nx:
                    x_out[...] = x_s[...]
                    if dfs:
                        xlo_out[...] = xlo_s[...]
                if nn_total:
                    z_out[...] = z_s[...]
                    if dfs:
                        zlo_out[...] = zlo_s[...]
                    zw_out[...] = zw_s[...]
                if np_total:
                    wp_out[...] = wp_s[...]
                if dz_total:
                    # without extrapolation the sensitivity is untouched;
                    # pass the input through (never leave the out-buffer
                    # uninitialized -- run() stores it into the state dict
                    # and a sibling extrapolating runner would read VMEM
                    # garbage after a two-phase power-up handoff)
                    dzdp_out[...] = dzdp_s[...] if extrap else dzdp_in[...]
                pmode_out[...] = pmode_s[...]
                fail_out[...] = fail_s[...]
                iters_out[...] = iters_s[...]
                floored_out[...] = floored_s[...]

        return kernel, (nu_t, nu_l)

    def _group_S(self, S: int) -> int:
        """Largest divisor of S not exceeding the configured group size.
        Partial groups (Sg < S) must keep the sublane dimension divisible
        by 8 (Mosaic block-shape constraint), i.e. groups of >= 1024
        lanes; smaller requests fall back to min(8, S)."""
        Sg = min(self.group_S, S)
        # VMEM safety caps (16 MiB Mosaic scoped-stack limit), measured
        # on the superover chain kernel: one 16384-lane group overflows
        # outright (20.4 MiB of per-lane tables + state), so a single
        # group is capped at 8192 lanes (measured fit); and MULTI-group
        # grids double-buffer each group's tables for prefetch, so split
        # runs overflow even with 8192-lane groups (16.2 MiB) -- any
        # split is capped at 4096-lane groups, which costs little
        # (aggregate throughput saturates by 4096 lanes).
        Sg = min(Sg, 8192 // LANE)
        if Sg < S:
            Sg = min(Sg, 4096 // LANE)
        while S % Sg:
            Sg -= 1
        if Sg < 8 and Sg != S:
            Sg = 8 if S % 8 == 0 else S
        return Sg

    def _compiled(self, S: int, T0: int):
        """Kernel for ``T0`` true samples.  The time axis is padded to a
        multiple of the (8-aligned, SMEM-tileable) chunk; padded samples are
        masked inside the kernel so they never advance the state.  Lanes are
        partitioned into groups of ``Sg`` sublane-blocks; the grid is
        (groups, time chunks) with time fastest, so each group runs its
        whole time axis with VMEM-resident state, exiting Newton as soon as
        *its own* lanes are done.  With a ``mesh``, the per-device kernel
        covers S/ndev sublane blocks and is shard_map-ed over the lane
        axis (pure SPMD, no collectives)."""
        ndev = self.mesh.devices.size if self.mesh is not None else 1
        if S % ndev:
            raise ValueError(f"lane blocks ({S}) not divisible by the "
                             f"mesh size ({ndev})")
        S_loc = S // ndev
        Sg = self._group_S(S_loc)
        G = S_loc // Sg
        Tc = min(self.Tc, -(-T0 // 8) * 8)
        # VMEM budget (16 MB scoped): the state/warm-start buffers cost
        # (in + out + scratch) each; the y output block is double-buffered.
        # Size the time chunk so everything fits with margin.
        vec = Sg * LANE * 4
        nfixed = (2 * max(self.nx, 1) + 3 * max(self.nn_total, 1)
                  + max(self.np_total, 1) + max(self.dz_total, 1)
                  + 4 + 2 * max(self.nsub, 1) + 2 * max(self.nvar, 1)
                  + len(self.lane_idx) + len(self.scale_idx))
        # in/out/scratch, each potentially double-buffered by Mosaic
        fixed = 6 * nfixed * vec
        budget = 16 * 2**20 - fixed - 4 * 2**20
        y_row = max(self.ny, 1) * vec
        Tc = min(Tc, max(8, budget // (2 * y_row)))
        Tc = max(8, (Tc // 8) * 8)
        T = -(-T0 // Tc) * Tc
        key = (S, T0)
        if key in self._jit_cache:
            return self._jit_cache[key], T
        nsteps = T // Tc
        kernel, (nu_t, nu_l) = self._build(Sg, Tc, T0)
        nu_l += len(self.scale_idx)
        nx = max(self.nx, 1)
        ny = self.ny
        nn_total = max(self.nn_total, 1)
        np_total = max(self.np_total, 1)
        dz_total = max(self.dz_total, 1)
        dt = jnp.float32

        def grouped(shape):
            # lane-grouped array: block (n, Sg, LANE) at group g
            return pl.BlockSpec(shape, lambda g, i: (0, g, 0),
                                memory_space=pltpu.VMEM)

        nsub_m = max(self.nsub, 1)
        in_specs = [
            pl.BlockSpec((Tc, max(nu_t, 1)), lambda g, i: (i, 0),
                         memory_space=pltpu.SMEM),
            grouped((max(nu_l, 1), Sg, LANE)),
            grouped((nsub_m, Sg, LANE)),
            grouped((3 * nsub_m, Sg, LANE)),
            grouped((max(self.nvar, 1), Sg, LANE)),
            grouped((max(self.nvar, 1), Sg, LANE)),
            grouped((nx, Sg, LANE)),
            grouped((nx, Sg, LANE)),
            grouped((nn_total, Sg, LANE)),
            grouped((nn_total, Sg, LANE)),
            grouped((nn_total, Sg, LANE)),
            grouped((np_total, Sg, LANE)),
            grouped((dz_total, Sg, LANE)),
            grouped((nsub_m, Sg, LANE)),
        ]
        out_specs = [
            pl.BlockSpec((Tc, max(ny, 1), Sg, LANE),
                         lambda g, i: (i, 0, g, 0),
                         memory_space=pltpu.VMEM),
            grouped((nx, Sg, LANE)),
            grouped((nx, Sg, LANE)),
            grouped((nn_total, Sg, LANE)),
            grouped((nn_total, Sg, LANE)),
            grouped((nn_total, Sg, LANE)),
            grouped((np_total, Sg, LANE)),
            grouped((dz_total, Sg, LANE)),
            grouped((nsub_m, Sg, LANE)),
            pl.BlockSpec((Sg, LANE), lambda g, i: (g, 0),
                         memory_space=pltpu.VMEM),
            grouped((nsub_m, Sg, LANE)),
            pl.BlockSpec((Sg, LANE), lambda g, i: (g, 0),
                         memory_space=pltpu.VMEM),
        ]
        fn = pl.pallas_call(
            kernel,
            grid=(G, nsteps),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((T, max(ny, 1), S_loc, LANE), dt),
                jax.ShapeDtypeStruct((nx, S_loc, LANE), dt),
                jax.ShapeDtypeStruct((nx, S_loc, LANE), dt),
                jax.ShapeDtypeStruct((nn_total, S_loc, LANE), dt),
                jax.ShapeDtypeStruct((nn_total, S_loc, LANE), dt),
                jax.ShapeDtypeStruct((nn_total, S_loc, LANE), dt),
                jax.ShapeDtypeStruct((np_total, S_loc, LANE), dt),
                jax.ShapeDtypeStruct((dz_total, S_loc, LANE), dt),
                jax.ShapeDtypeStruct((nsub_m, S_loc, LANE), dt),
                jax.ShapeDtypeStruct((S_loc, LANE), jnp.int32),
                jax.ShapeDtypeStruct((nsub_m, S_loc, LANE), jnp.int32),
                jax.ShapeDtypeStruct((S_loc, LANE), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nx, Sg, LANE), dt),
                pltpu.VMEM((nx, Sg, LANE), dt),
                pltpu.VMEM((nn_total, Sg, LANE), dt),
                pltpu.VMEM((nn_total, Sg, LANE), dt),
                pltpu.VMEM((nn_total, Sg, LANE), dt),
                pltpu.VMEM((np_total, Sg, LANE), dt),
                pltpu.VMEM((dz_total, Sg, LANE), dt),
                pltpu.VMEM((nsub_m, Sg, LANE), dt),
                pltpu.VMEM((Sg, LANE), jnp.int32),
                pltpu.VMEM((nsub_m, Sg, LANE), jnp.int32),
                pltpu.VMEM((Sg, LANE), jnp.int32),
            ],
            interpret=self.interpret,
        )
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P
            ax = self.mesh_axis
            sh3 = P(None, ax, None)   # (n, S, LANE) arrays: shard S
            fn = jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(None, None), sh3, sh3, sh3, sh3, sh3,
                          sh3, sh3, sh3, sh3, sh3, sh3, sh3, sh3),
                out_specs=(P(None, None, ax, None), sh3, sh3, sh3, sh3,
                           sh3, sh3, sh3, sh3, P(ax, None), sh3,
                           P(ax, None)),
                check_vma=False)
        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted, T

    # -- public API -------------------------------------------------------
    def initial_state(self, lanes: int, at_steady: bool = False):
        """Initial carry.  Default matches the reference (x = 0, z = initial
        operating point); ``at_steady`` starts at the centering steady state
        (x~ = z~ = 0), skipping the power-up transient.  With per-lane
        models, each lane starts at ITS model's initial operating point."""
        S = lanes // LANE
        nm = len(self.models)
        midx = self._lane_model_idx(lanes)

        rows = {k: [] for k in ("x", "xlo", "z", "wp", "dz")}
        for m, p in zip(self.models, self._prep):
            x0v = (np.zeros(max(self.nx, 1)) if at_steady or self.nx == 0
                   else -p["x_ss"] / self.Tx)
            xlo_v = (x0v - x0v.astype(np.float32).astype(np.float64))
            if self.nn_total:
                z0 = (np.zeros(self.nn_total) if at_steady
                      else np.concatenate([np.asarray(z, float)
                                           for z in m.init_zs]) - p["z_ss"])
            else:
                z0 = np.zeros(1)
            dz0 = (np.concatenate([d.reshape(-1) for d in p["dzdp0"]])
                   if self.dz_total else np.zeros(1))
            # the extrapolation origin (wp, zw) must be a CONSISTENT pair:
            # the homotopy continuation anchors its path at p = wp where
            # z = zw is the known solution.  zw starts at the initial
            # operating point (solution at u = 0, x = x_init), so wp must
            # be the centered p at exactly that state -- wp = 0 (i.e.
            # u = u_ss, pots at center, supply on) is a different point
            # and breaks the anchor for every power-up failure.
            wp0 = np.zeros(max(self.np_total, 1))
            if self.np_total and not at_steady:
                u_c = -self.u_ss  # u = 0 in centered coordinates
                zc = z0 if self.nn_total else np.zeros(0)
                off = 0
                for kk in range(self.nsub):
                    npk = m.np(kk)
                    wp0[off:off + npk] = (
                        p["dq"][kk] @ x0v[:self.nx]
                        + np.asarray(m.eqs[kk], float) @ u_c
                        + np.asarray(m.fqprevs[kk], float)
                        @ zc[:self.nn_total])
                    off += npk
            rows["x"].append(x0v)
            rows["xlo"].append(xlo_v)
            rows["z"].append(z0)
            rows["wp"].append(wp0)
            rows["dz"].append(dz0)

        def per_lane(key, n):
            arr = np.asarray(rows[key], np.float32)   # (nm, n)
            if arr.shape[1] == 0:
                arr = np.zeros((nm, n), np.float32)
            return jnp.asarray(np.ascontiguousarray(
                arr[midx].T.reshape(-1, S, LANE)))

        return {"x": per_lane("x", max(self.nx, 1)),
                "xlo": per_lane("xlo", max(self.nx, 1)),
                "z": per_lane("z", max(self.nn_total, 1)),
                "zlo": jnp.zeros((max(self.nn_total, 1), S, LANE),
                                 jnp.float32),
                "zw": per_lane("z", max(self.nn_total, 1)),
                "wp": per_lane("wp", max(self.np_total, 1)),
                "dzdp": per_lane("dz", max(self.dz_total, 1)),
                "pmode": jnp.zeros((max(self.nsub, 1), S, LANE),
                                   jnp.float32)}

    def steady_initial_state(self, lane_values, runin: int = 4096,
                             rounds: int = 12):
        """Per-lane steady start: every lane begins at the steady state of
        ITS OWN constant inputs (pot positions, trims), computed host-side
        by :func:`acme_tpu.runtime.steadystate_sweep`.

        Eliminates the power-up transient -- and its solver cost (hundreds
        of iterations/sample for thousands of samples at stiff pot
        corners) -- entirely for constant-pot runs.  Reference analog:
        ``steadystate!`` + ``run!`` state persistence (ACME.jl:499-503,
        552-568), lane-batched.

        ``lane_values`` exactly as passed to :meth:`run` ((L, nu_l),
        uncentered); scale columns, if any, are ignored for the steady
        solve (time-varying inputs are taken at their center values).
        Lanes whose steady solve does not certify keep their computed
        near-steady point (a warning reports the count); the kernel's
        power-up machinery still covers them."""
        from ..runtime import steadystate_sweep
        lane_values = np.asarray(lane_values, float)
        nu_l0 = len(self.lane_idx)
        L = lane_values.shape[0] if lane_values.size else LANE
        if L % LANE:
            raise ValueError(f"lanes ({L}) must be a multiple of {LANE}")
        S = L // LANE
        midx = self._lane_model_idx(L)
        x_l = np.zeros((L, max(self.nx, 1)))
        z_l = np.zeros((L, max(self.nn_total, 1)))
        wp_l = np.zeros((L, max(self.np_total, 1)))
        dz_l = np.zeros((L, max(self.dz_total, 1)))
        floors_l = np.zeros((L, max(self.nsub, 1)))
        conv = np.ones(L, bool)
        for mi, (m, p) in enumerate(zip(self.models, self._prep)):
            sel = np.nonzero(midx == mi)[0]
            if sel.size == 0:
                continue
            u_lanes = np.broadcast_to(self.u_ss,
                                      (sel.size, m.nu)).astype(float).copy()
            if nu_l0 and lane_values.size:
                u_lanes[:, list(self.lane_idx)] = lane_values[sel, :nu_l0]
            # dedup identical steady problems: lanes that differ only in
            # SCALE columns (e.g. a 4096-level input sweep) all share one
            # constant-input vector here, so solve each unique row once
            # and scatter (measured: the level sweep's steady seeding was
            # 4096 copies of the same solve, ~13 min of pure waste)
            uu, inv = np.unique(u_lanes, axis=0, return_inverse=True)
            if uu.shape[0] < u_lanes.shape[0]:
                xs, zs, cv, fl = steadystate_sweep(m, uu, runin=runin,
                                                   rounds=rounds,
                                                   return_floors=True)
                if not cv.all() and uu.shape[0] <= 64:
                    # dedup made these solves cheap, so failed unique rows
                    # get one LONG run-in retry: the chain superover's vb
                    # bias rail settles with tau ~ 30k-150k samples, far
                    # past the short-run-in + Newton-jump budget when the
                    # jump is too big for the branch-guarded verify
                    # (measured at drive=tone=1.0: runin=512 fails,
                    # runin=65536 certifies)
                    bad = np.nonzero(~cv)[0]
                    xs2, zs2, cv2, fl2 = steadystate_sweep(
                        m, uu[bad], runin=max(runin, 65536), rounds=rounds,
                        return_floors=True)
                    xs[bad], zs[bad] = xs2, zs2
                    cv[bad], fl[bad] = cv2, fl2
                xs, zs, cv, fl = xs[inv], zs[inv], cv[inv], fl[inv]
            else:
                xs, zs, cv, fl = steadystate_sweep(m, u_lanes, runin=runin,
                                                   rounds=rounds,
                                                   return_floors=True)
            conv[sel] = cv
            floors_l[sel, :fl.shape[1]] = fl
            if self.nx:
                x_l[sel, :self.nx] = (xs - p["x_ss"]) / self.Tx
            if self.nn_total:
                z_l[sel, :self.nn_total] = zs - p["z_ss"]
            uc = u_lanes - self.u_ss
            # consistent extrapolation origin (wp, zw) + per-lane
            # sensitivity dz/dp = -(Jq Fq)^{-1} (Jq Pexp) at the steady
            # point, with the RUNTIME Jacobian (solvers.jl:164-178)
            off = 0
            doff = 0
            zoff = 0
            for kk in range(self.nsub):
                npk, nnk = m.np(kk), m.nn(kk)
                if self.np_total:
                    wp_l[sel, off:off + npk] = (
                        x_l[sel, :self.nx] @ p["dq"][kk].T
                        + uc @ np.asarray(m.eqs[kk], float).T
                        + z_l[sel, :self.nn_total]
                        @ np.asarray(m.fqprevs[kk], float).T)
                if nnk and npk:
                    p_phys = (np.asarray(m.dqs[kk], float) @ xs.T
                              + np.asarray(m.eqs[kk], float) @ u_lanes.T
                              + np.asarray(m.fqprevs[kk], float) @ zs.T)
                    fq = np.asarray(m.fqs[kk], float)
                    pexp = np.asarray(m.pexps[kk], float)
                    q = (np.asarray(m.q0s[kk], float)[:, None]
                         + pexp @ p_phys + fq @ zs.T[zoff:zoff + nnk])
                    with np.errstate(all="ignore"):
                        _, Jq = m.nl_funcs[kk](np, q)
                        J = np.einsum("ijl,jk->lik", Jq, fq)
                        Jp = np.einsum("ijl,jk->lik", Jq, pexp)
                        d = -np.linalg.pinv(J) @ Jp     # (sel, nnk, npk)
                    bad = ~np.isfinite(d).all(axis=(1, 2))
                    if bad.any():
                        d[bad] = p["dzdp0"][kk]
                    # zero cond-spike sensitivities (see the engine's
                    # steady_initial_state): an exploding extrapolated
                    # warm start costs far more than a constant one
                    steep = np.abs(d).max(axis=(1, 2)) > 1e3
                    d[steep] = 0.0
                    dz_l[sel, doff:doff + nnk * npk] = d.reshape(
                        sel.size, -1)
                off += npk
                doff += nnk * npk
                zoff += nnk
        n_bad = int((~conv).sum())
        # certified-with-floor lanes (dead-zone subsystems at their exact
        # steady state, e.g. the chain superover's reverse-biased bias
        # pair at ~4e-4 -- ref test/runtests.jl:763-764) export their
        # measured per-subsystem residual floors: _lane_tolerances raises
        # those lanes' gates to the floor so the kernel accepts the best
        # point ANY solver can reach instead of grinding the rescue
        # ladder every quiet sample.  Floors are zeroed on uncertified
        # (cold-start) lanes -- default gates apply there.
        floors_l[~conv] = 0.0
        self._steady_floors = floors_l
        if n_bad:
            warnings.warn(f"steady_initial_state: {n_bad}/{L} lanes did "
                          "not certify steady; they start COLD and power "
                          "up dynamically.")

        def as_block(arr):                       # (L, n) -> (n, S, LANE)
            a_ = np.asarray(arr, np.float32)
            return jnp.asarray(np.ascontiguousarray(
                a_.T.reshape(-1, S, LANE)))

        xlo = x_l - x_l.astype(np.float32).astype(np.float64)
        zlo = z_l - z_l.astype(np.float32).astype(np.float64)
        state = {"x": as_block(x_l), "xlo": as_block(xlo),
                 "z": as_block(z_l), "zlo": as_block(zlo),
                 "zw": as_block(z_l),
                 "wp": as_block(wp_l), "dzdp": as_block(dz_l),
                 "pmode": jnp.zeros((max(self.nsub, 1), S, LANE),
                                    jnp.float32)}
        if n_bad:
            # uncertified lanes (bistable pot corners: the near-steady
            # point can be a wrong-root latch whose warm origins make
            # every sample of the walk back a homotopy grind) start from
            # the standard cold initial state instead
            base = self.initial_state(L)
            m_ok = jnp.asarray(conv.reshape(S, LANE))
            state = {k: jnp.where(m_ok[None], v, base[k])
                     for k, v in state.items()}
        return state

    def _lane_tolerances(self, lane_values_centered, S):
        """Per-lane loop tolerance/gate (plain-f32 floor) and final
        acceptance gate (compensated floor).

        The float32 residual floor scales with the residual's term
        magnitudes, which depend on the lane constants (e.g. a drive pot at
        0.05 vs 0.95 changes the pot-row term scale by ~20x).  Estimating
        the floor per lane at its own approximate operating q keeps corner
        lanes from being flagged non-converged -- and, more importantly,
        from spinning the shared Newton loop to its iteration cap on every
        sample (the early exit waits for all lanes of the group).

        Returns (ltol (nsub,S,128), gates (3*nsub,S,128)) with
        gates[:nsub] the loop stagnation gates, gates[nsub:2*nsub] the
        final polish acceptance gates, and gates[2*nsub:] the polish
        target tolerances (compensated floor)."""
        L = S * LANE
        nsub = max(self.nsub, 1)
        tol_l = np.full((nsub, L), max(self.tol, 1e-9), np.float32)
        gate_l = np.full((3 * nsub, L), 32.0 * self.tol, np.float32)
        gate_l[2 * nsub:] = max(self.tol, 1e-9)
        lv = np.asarray(lane_values_centered, float)
        midx = self._lane_model_idx(L)
        for kk in range(self.nsub):
            floor_l = np.zeros(L)
            floor_f = np.zeros(L)
            for mi, (m, p) in enumerate(zip(self.models, self._prep)):
                sel = np.nonzero(midx == mi)[0]
                if sel.size == 0:
                    continue
                q = np.broadcast_to(p["q0"][kk][:, None],
                                    (len(p["q0"][kk]), sel.size)).copy()
                if self.lane_idx and lv.size:
                    eq_lane = np.asarray(m.eqs[kk], float)[
                        :, list(self.lane_idx)]
                    q += np.asarray(m.pexps[kk], float) \
                        @ (eq_lane @ lv[sel, :len(self.lane_idx)].T)
                floor_l[sel] = self._floor_measure(kk, q, comp=False,
                                                   model=m)
                floor_f[sel] = self._floor_measure(kk, q, model=m)
            tol_l[kk] = np.maximum(self.tol, 8.0 * floor_l)
            gate_l[kk] = np.maximum(96.0 * floor_l, 32.0 * self.tol)
            gate_l[nsub + kk] = np.maximum(96.0 * floor_f, 32.0 * self.tol)
            gate_l[2 * nsub + kk] = np.maximum(self.tol, 8.0 * floor_f)
        # steady-seeded dead-zone floors (steady_initial_state): a lane
        # whose subsystem is certified-with-floor gets its loop/acceptance
        # gates raised to small multiples of the measured f64 residual
        # floor -- the kernel then accepts the best point any solver can
        # reach there (the reference warns per sample at such operating
        # points; we measured the floor instead)
        fl = getattr(self, "_steady_floors", None)
        if fl is not None and fl.shape[0] == L and self.nsub:
            flT = np.asarray(fl, np.float32).T           # (nsub, L)
            for kk in range(self.nsub):
                tol_l[kk] = np.maximum(tol_l[kk], 2.0 * flT[kk])
                gate_l[kk] = np.maximum(gate_l[kk], 4.0 * flT[kk])
                gate_l[nsub + kk] = np.maximum(gate_l[nsub + kk],
                                               4.0 * flT[kk])
                gate_l[2 * nsub + kk] = np.maximum(gate_l[2 * nsub + kk],
                                                   2.0 * flT[kk])
        return (tol_l.reshape(nsub, S, LANE),
                gate_l.reshape(3 * nsub, S, LANE))

    def _powerup_runner(self):
        """Sibling runner with the conservative power-up config.  Shares
        all prepared coefficients/centering (read-only) with self; only the
        solver-config attributes and the jit cache differ, so building it
        costs nothing beyond the (persistently cached) kernel compile."""
        if self._pw_runner is None:
            import copy
            r = copy.copy(self)
            r._jit_cache = {}
            r._pw_runner = None
            r.powerup_cfg = None
            cfg = dict(self.powerup_cfg)
            if "newton_iters" in cfg:
                r.K = int(cfg.pop("newton_iters"))
            if "df_polish" in cfg:
                v = cfg.pop("df_polish")
                if v in ("final", "plain_final", "comp_final"):
                    r.df_polish = v if r.compensated else False
                else:
                    r.df_polish = bool(v) and r.compensated
            if "fast_verify" in cfg:
                r.fast_verify = str(cfg.pop("fast_verify"))
            if "fast_keep" in cfg:
                r.fast_keep = str(cfg.pop("fast_keep"))
            for k in ("fast_iters", "polish_iters", "polish_fixed",
                      "stall_strikes", "plateau_strikes"):
                if k in cfg:
                    setattr(r, k, int(cfg.pop(k)))
            if "extrapolate" in cfg:
                v = cfg.pop("extrapolate")
                r.extrapolate = "track" if v == "track" else bool(v)
            for k in ("compensated", "pivot", "df_state",
                      "polish_only"):
                if k in cfg:
                    setattr(r, k, bool(cfg.pop(k)))
            if "verdict_jac" in cfg:
                v = str(cfg.pop("verdict_jac"))
                if v not in ("df", "plain"):
                    raise ValueError(f"verdict_jac must be df|plain, "
                                     f"got {v!r}")
                r.verdict_jac = "df" if r.df_solve else v
            if "verdict_refine" in cfg:
                r.verdict_refine = int(cfg.pop("verdict_refine"))
            if cfg:
                raise ValueError(f"unknown powerup override(s): "
                                 f"{sorted(cfg)}")
            self._pw_runner = r
        return self._pw_runner

    def _check_outputs(self, y, info):
        """Surface the reference's mid-run failure semantics at the user
        level (ACME.jl:688-694: warn on non-convergence, error on
        non-finite): a device-side two-scalar reduction (the engine's
        _finite_conv pattern, engine.py:62-66), then one tiny host fetch --
        a production run with garbage lanes cannot complete silently."""
        finite, nfail = _fused_finite_fails(y, info.fails)
        if not bool(finite):
            raise RuntimeError(
                "fused run produced non-finite output; inspect "
                "FusedInfo.fails for the offending lanes (reference "
                "semantics: ACME.jl:692-694)")
        nfail = int(nfail)
        if nfail:
            warnings.warn(
                f"fused run: {nfail} subsystem solve(s) across all lanes "
                "and samples missed the acceptance gate (solution kept, "
                "output may be degraded on those lanes; see "
                "FusedInfo.fails). Reference warn path: ACME.jl:688-691.")

    def run(self, u_time, lane_values, state=None, check=True):
        """u_time: (nu_t, T); lane_values: (L, nu_l); returns
        (y (L, ny, T), state, fail_counts (L,)).

        ``check=True`` (default) runs a device-side finiteness/convergence
        reduction after the kernel and warns (non-convergence) or raises
        (non-finite output) on the host -- the reference's mid-run failure
        semantics (ACME.jl:688-694).  Pass ``check=False`` in latency-
        critical chained loops to keep runs fully asynchronous (each check
        costs one host round-trip); inspect ``FusedInfo`` yourself then."""
        if state is None and self.powerup_steady:
            state = self.steady_initial_state(lane_values)
        if state is None and self.powerup_cfg is not None:
            ut = np.asarray(u_time, float)
            T0 = ut.shape[1]
            W = min(self.powerup_samples, T0)
            pr = self._powerup_runner()
            if W >= T0:
                return pr.run(ut, lane_values, state=None, check=check)
            y1, state, info1 = pr.run(ut[:, :W], lane_values, state=None,
                                      check=False)
            y2, state, info2 = self.run(ut[:, W:], lane_values, state=state,
                                        check=False)
            y = jnp.concatenate([y1, y2], axis=2)
            info = FusedInfo(fails=info1.fails + info2.fails,
                             iters=info1.iters + info2.iters,
                             floored=info1.floored + info2.floored)
            if check:
                self._check_outputs(y, info)
            return y, state, info
        u_time = np.asarray(u_time, float) \
            - self.u_ss[list(self.time_idx)][:, None]
        u_time = u_time.astype(np.float32)
        lane_values = np.array(lane_values, float, copy=True)
        nu_l0 = len(self.lane_idx)
        nu_l_req = nu_l0 + len(self.scale_idx)
        if nu_l_req and (lane_values.ndim != 2
                         or lane_values.shape[1] != nu_l_req):
            raise ValueError(
                f"lane_values must be 2-D with {nu_l_req} columns "
                f"({nu_l0} constants + {len(self.scale_idx)} scales), "
                f"got shape {lane_values.shape}")
        if nu_l0:
            lane_values[:, :nu_l0] -= self.u_ss[list(self.lane_idx)]
        lane_values = lane_values.astype(np.float32)
        L = lane_values.shape[0] if lane_values.size else LANE
        if L % LANE:
            raise ValueError(f"lanes ({L}) must be a multiple of {LANE}")
        S = L // LANE
        T0 = u_time.shape[1]
        if state is None:
            state = self.initial_state(L)
        nu_t = len(self.time_idx)
        nu_l = len(self.lane_idx) + len(self.scale_idx)
        lv = lane_values.T.reshape(nu_l, S, LANE) if nu_l \
            else np.zeros((1, S, LANE), np.float32)
        tol_l, gate_l = self._lane_tolerances(lane_values, S)
        coef_hi, coef_lo = self._coef_tables(S)
        # trace and execute with x64 disabled: the kernel is float32
        # throughout and weak-typed python floats must not promote anything
        # to float64 (Mosaic rejects 64-bit scalars)
        with jax.enable_x64(False):
            # Mosaic sizes the kernel's live-value stack inside the same
            # 16 MB scoped-VMEM budget as the block buffers, and the stack
            # need is not predictable from here; on a scoped-vmem OOM,
            # halve the time chunk (shrinking the double-buffered y block)
            # and recompile.
            for attempt in range(6):
                fn, T = self._compiled(S, T0)
                u_pad = np.zeros((T, max(nu_t, 1)), np.float32)
                if nu_t:
                    u_pad[:T0, :] = u_time.T
                try:
                    (y, x_o, xlo_o, z_o, zlo_o, zw_o, wp_o, dz_o, pm_o,
                     fails, iters, floored) = fn(
                        jnp.asarray(u_pad), jnp.asarray(lv),
                        jnp.asarray(tol_l), jnp.asarray(gate_l),
                        jnp.asarray(coef_hi), jnp.asarray(coef_lo),
                        state["x"], state["xlo"], state["z"],
                        state.get("zlo", jnp.zeros_like(state["z"])),
                        state["zw"], state["wp"], state["dzdp"],
                        state.get("pmode", jnp.zeros(
                            (max(self.nsub, 1), S, LANE), jnp.float32)))
                    break
                except Exception as e:  # jax.errors.JaxRuntimeError etc.
                    if ("vmem" not in str(e).lower()
                            or self.Tc <= 8 or attempt == 5):
                        raise
                    self._jit_cache.pop((S, T0), None)
                    self.Tc = max(8, self.Tc // 2)
        y = jnp.transpose(y, (2, 3, 1, 0)).reshape(S * LANE,
                                                   max(self.ny, 1), T)
        y = y[:, :self.ny, :T0]
        state = {"x": x_o, "xlo": xlo_o, "z": z_o, "zlo": zlo_o,
                 "zw": zw_o, "wp": wp_o, "dzdp": dz_o, "pmode": pm_o}
        info = FusedInfo(
            fails=fails.reshape(-1),
            iters=jnp.transpose(iters, (1, 2, 0)).reshape(S * LANE, -1),
            floored=floored.reshape(-1))
        if check:
            self._check_outputs(y, info)
        return y, state, info
