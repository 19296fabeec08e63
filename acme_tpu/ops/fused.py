"""Fused Pallas time-loop kernel: the whole run loop in one TPU kernel.

The lax.scan runtime (acme_tpu.engine) pays a fixed per-sample overhead
(XLA While iteration + small-op dispatch, ~hundreds of ns..us) that caps
real-time factor regardless of lane count.  This kernel removes it: the
complete per-sample pipeline of the reference's step! (/root/reference/
src/ACME.jl:666-715) -- ordered subsystem Newton solves, output row, state
update -- runs inside a single pallas_call, with

  * lanes laid out as (S, 128) vector blocks (S = lanes/128) so every
    arithmetic op is a full-width VPU op;
  * model coefficients baked into the instruction stream as immediates
    (they are compile-time Python floats -- no memory traffic at all);
  * state, Newton warm starts and convergence counters resident in VMEM
    scratch across a time-chunk grid (TPU grid steps run sequentially, so
    scratch persists);
  * fixed-trip masked Newton (K iterations, converged lanes freeze), the
    TPU-native replacement for the reference's data-dependent iteration
    (SURVEY.md section 7): the previous-sample z is the warm start, which
    the 44.1 kHz sample continuity makes excellent (1-2 effective
    iterations in steady state);
  * shared time-series inputs read as scalars from SMEM; per-lane constant
    inputs (pot positions: the sweep axis) as VMEM vectors.

Accuracy: float32.  The ordered-subsystem/Newton algebra is identical to the
float64 engine; parity is measured (see tests/test_fused.py and bench).
For strict float64 parity use the scan engine.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedRunner"]

LANE = 128


def _f(x):
    return float(x)


def _solve_rows(J, r):
    """Solve the per-lane dense system J dz = r where J is a list of lists of
    (S,128) vectors (one small system per lane, vectorized over lanes).

    The raw Newton Jacobians here have condition numbers up to ~1e8 purely
    from unit disparity (junction conductances 1e-10..1e2 against unit
    voltage rows), which float32 cannot solve at all (cond * eps > 1).
    Row/column inf-norm equilibration brings that down to ~1e4-1e5, after
    which a pivoted f32 elimination plus one iterative-refinement step gives
    Newton directions good to ~1e-4 relative -- ample for convergence, with
    final accuracy set by the residual evaluation.  The reference gets the
    same effect for free by solving in f64 (solvers.jl:46-132).

    n==1,2: closed form.  n>=3: Gaussian elimination with per-lane partial
    pivoting expressed as where-selects."""
    n = len(r)
    if n == 1:
        return [r[0] / J[0][0]]
    if n == 2:
        det = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        inv = 1.0 / det
        return [(r[0] * J[1][1] - r[1] * J[0][1]) * inv,
                (r[1] * J[0][0] - r[0] * J[1][0]) * inv]

    # equilibrate: Js = Dr J Dc, solve Js y = Dr r, dz = Dc y
    def recip_safe(v):
        return jnp.where(v > 0, 1.0 / jnp.where(v > 0, v, 1.0),
                         jnp.ones_like(v))

    rs = []
    for i in range(n):
        m = jnp.abs(J[i][0])
        for jj in range(1, n):
            m = jnp.maximum(m, jnp.abs(J[i][jj]))
        rs.append(recip_safe(m))
    Jr = [[J[i][jj] * rs[i] for jj in range(n)] for i in range(n)]
    cs = []
    for jj in range(n):
        m = jnp.abs(Jr[0][jj])
        for i in range(1, n):
            m = jnp.maximum(m, jnp.abs(Jr[i][jj]))
        cs.append(recip_safe(m))
    Js = [[Jr[i][jj] * cs[jj] for jj in range(n)] for i in range(n)]
    rscaled = [r[i] * rs[i] for i in range(n)]
    y = _solve_rows_raw(Js, rscaled)
    dz = [y[jj] * cs[jj] for jj in range(n)]
    # one iterative-refinement step (re-eliminates; n is tiny)
    res2 = []
    for i in range(n):
        acc = r[i]
        for jj in range(n):
            acc = acc - J[i][jj] * dz[jj]
        res2.append(acc * rs[i])
    e = _solve_rows_raw(Js, res2)
    return [dz[jj] + e[jj] * cs[jj] for jj in range(n)]


def _solve_rows_raw(J, r):
    n = len(r)
    # general: augmented elimination on vector rows
    A = [row[:] + [r[i]] for i, row in enumerate(J)]
    for k in range(n):
        # per-lane partial pivot: select the max-|.| row among k..n-1
        best = A[k]
        best_abs = jnp.abs(A[k][k])
        for i in range(k + 1, n):
            cand_abs = jnp.abs(A[i][k])
            take = cand_abs > best_abs
            # swap semantics: rows i and current best exchange contents
            new_best = [jnp.where(take, A[i][c], best[c]) for c in range(n + 1)]
            A[i] = [jnp.where(take, best[c], A[i][c]) for c in range(n + 1)]
            best = new_best
            best_abs = jnp.maximum(cand_abs, best_abs)
        A[k] = best
        inv = 1.0 / A[k][k]
        for i in range(k + 1, n):
            f = A[i][k] * inv
            A[i] = [A[i][c] - f * A[k][c] for c in range(k, n + 1)]
            A[i] = [jnp.zeros_like(f)] * k + A[i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        acc = A[i][n]
        for c in range(i + 1, n):
            acc = acc - A[i][c] * x[c]
        x[i] = acc / A[i][i]
    return x


class FusedRunner:
    """Compile a DiscreteModel into a fused Pallas sweep runner.

    run(u_time (nu_t, T), lane_values (L, k), state=None) -> (y, state, fails)
    where inputs listed in ``lane_input_idx`` come from per-lane constants
    and the rest from the shared time series.  L must be a multiple of 128.
    """

    def __init__(self, model, lane_input_idx: Sequence[int] = (), *,
                 newton_iters: int = 64, tol: float = 1e-9, step_clip: float = 1.0,
                 time_chunk: int = 512, interpret: bool = False,
                 center: bool = True, center_u=None):
        self.model = model
        self.K = int(newton_iters)
        self.tol = float(tol)
        self.step_clip = float(step_clip)
        self.Tc = int(time_chunk)
        self.interpret = interpret
        self.lane_idx = tuple(int(i) for i in lane_input_idx)
        self.time_idx = tuple(i for i in range(model.nu) if i not in self.lane_idx)
        self.nx = model.nx
        self.ny = model.ny
        self.nn_total = model.nn()
        self.nsub = model.nsubsystems
        self._jit_cache = {}

        # Operating-point centering: float32 cannot represent audio-scale
        # signals riding on supply-scale biases without catastrophic
        # cancellation (a 4.5 V bias costs ~2.7e-7 absolute noise; the
        # useful signal may be 20 mV).  We therefore shift the runtime
        # variables to deviations around a steady state computed once in
        # float64 on the host: x~ = x - x_ss, z~ = z - z_ss, u~ = u - u_ss.
        # The model is affine in (x, u, z) outside the nonlinearity, so only
        # the constant terms change; the nonlinearity still sees the true
        # absolute q (its constant part is one exactly-rounded f64 scalar
        # per component, with no runtime cancellation).
        self.u_ss = np.zeros(model.nu)
        if center_u is not None:
            self.u_ss = np.asarray(center_u, float).copy()
        elif self.lane_idx:
            for i in self.lane_idx:
                self.u_ss[i] = 0.5  # pots at mid travel
        self.x_ss = np.zeros(model.nx)
        self.z_ss = np.zeros(self.nn_total)
        if center and (model.nx or self.nn_total):
            try:
                from ..runtime import steadystate
                self.x_ss, self.z_ss = steadystate(model, self.u_ss,
                                                   return_z=True)
            except Exception:
                self.u_ss = np.zeros(model.nu)  # centering unavailable
        # centered constants (float64, rounded once)
        a = np.asarray(model.a, float)
        b = np.asarray(model.b, float)
        c = np.asarray(model.c, float)
        self.x0_c = (np.asarray(model.x0, float) + a @ self.x_ss
                     + b @ self.u_ss + c @ self.z_ss - self.x_ss)
        self.y0_c = (np.asarray(model.y0, float)
                     + np.asarray(model.dy, float) @ self.x_ss
                     + np.asarray(model.ey, float) @ self.u_ss
                     + np.asarray(model.fy, float) @ self.z_ss)
        self.q0_c = []
        self.tols = []
        self.gates = []
        off = 0
        for kk in range(self.nsub):
            nn_k = model.nn(kk)
            q0 = (np.asarray(model.q0s[kk], float)
                  + np.asarray(model.pexps[kk], float)
                  @ (np.asarray(model.dqs[kk], float) @ self.x_ss
                     + np.asarray(model.eqs[kk], float) @ self.u_ss
                     + np.asarray(model.fqprevs[kk], float) @ self.z_ss)
                  + np.asarray(model.fqs[kk], float) @ self.z_ss[off:off + nn_k])
            self.q0_c.append(q0)
            off += nn_k
            # per-subsystem convergence tolerance: the float32 residual floor
            # differs per subsystem by orders of magnitude (a pot residual is
            # volt-scale, a diode residual is mA-scale).  Evaluating the
            # residual at the exactly-known operating point in float32 gives
            # the rounding floor directly; tol is that floor with headroom.
            res32, _ = model.nl_funcs[kk](np, q0.astype(np.float32))
            floor = float(np.max(np.abs(res32))) if res32.size else 0.0
            # tol: success threshold; gate: 'close enough to be the float32
            # floor' -- Newton iterates that stagnate below the gate are
            # accepted (they sit on the rounding floor), above it they are
            # flagged as non-converged like the reference's warning path
            self.tols.append(max(self.tol, 64.0 * floor))
            self.gates.append(max(16384.0 * floor, 1e4 * self.tol))

    # -- kernel construction -------------------------------------------------
    def _build(self, S: int, Tc: int):
        m = self.model
        nx, ny, nn_total, K, tol = self.nx, self.ny, self.nn_total, self.K, self.tol
        step_clip = self.step_clip
        nsub = self.nsub
        a = np.asarray(m.a, float)
        b = np.asarray(m.b, float)
        c = np.asarray(m.c, float)
        x0 = self.x0_c
        dy = np.asarray(m.dy, float)
        ey = np.asarray(m.ey, float)
        fy = np.asarray(m.fy, float)
        y0 = self.y0_c
        subs = []
        off = 0
        for kk in range(nsub):
            subs.append(dict(
                dq=np.asarray(m.dqs[kk], float), eq=np.asarray(m.eqs[kk], float),
                fqprev=np.asarray(m.fqprevs[kk], float),
                fq=np.asarray(m.fqs[kk], float), pexp=np.asarray(m.pexps[kk], float),
                q0=self.q0_c[kk], nl=m.nl_funcs[kk], tol=self.tols[kk],
                gate=self.gates[kk],
                off=off, nn=m.nn(kk), np=m.np(kk), nq=m.nq(kk)))
            off += m.nn(kk)
        time_idx, lane_idx = self.time_idx, self.lane_idx
        nu_t, nu_l = len(time_idx), len(lane_idx)

        def dotv(coeffs, vecs, init=None):
            """sum_j coeffs[j] * vecs[j] with compile-time scalar coeffs;
            skips structural zeros (the model's sparsity is baked into the
            instruction stream at trace time)."""
            acc = init
            for cf, v in zip(coeffs, vecs):
                if cf == 0.0 or v is None:
                    continue
                term = _f(cf) * v
                acc = term if acc is None else acc + term
            return acc

        def kernel(u_ref, lane_ref, x_in, z_in, y_ref, x_out, z_out, fail_out,
                   x_s, z_s, fail_s):
            step_i = pl.program_id(0)

            @pl.when(step_i == 0)
            def _init():
                if nx:
                    x_s[...] = x_in[...]
                if nn_total:
                    z_s[...] = z_in[...]
                fail_s[...] = jnp.zeros_like(fail_s)

            lane_vals = [lane_ref[j] for j in range(nu_l)]  # (S,128) each

            def sample(t, _):
                # shared inputs for this sample (scalars from SMEM)
                u_full = [None] * (nu_t + nu_l)
                for jj, gidx in enumerate(time_idx):
                    u_full[gidx] = u_ref[t, jj]
                for jj, gidx in enumerate(lane_idx):
                    u_full[gidx] = lane_vals[jj]
                x_v = [x_s[j] for j in range(nx)]
                z_prev = [z_s[j] for j in range(nn_total)]
                z_all = list(z_prev)  # overwritten subsystem by subsystem
                any_fail = None
                for sub in subs:
                    nn_k, np_k, nq_k = sub["nn"], sub["np"], sub["nq"]
                    o = sub["off"]
                    # p = Dq x + Eq u + Fqprev z   (ref ACME.jl:681-686)
                    p = []
                    for i in range(np_k):
                        acc = dotv(sub["dq"][i], x_v)
                        acc = dotv(sub["eq"][i], u_full, acc)
                        acc = dotv(sub["fqprev"][i], z_all, acc)
                        p.append(acc if acc is not None else jnp.zeros_like(z_all[o]) if nn_total else 0.0)
                    # pfull = q0 + Pexp p
                    pfull = []
                    for ci in range(nq_k):
                        acc = dotv(sub["pexp"][ci], p)
                        base = _f(sub["q0"][ci])
                        pfull.append(base if acc is None else acc + base)
                    z0s = jnp.stack([jnp.broadcast_to(
                        jnp.asarray(z_all[o + i1], jnp.float32),
                        z_all[o].shape) for i1 in range(nn_k)])

                    def newton_iter(zs, prev_resmax):
                        z = [zs[i1] for i1 in range(nn_k)]
                        q = []
                        for ci in range(nq_k):
                            acc = dotv(sub["fq"][ci], z)
                            q.append(pfull[ci] if acc is None
                                     else acc + pfull[ci])
                        qv = jnp.stack([jnp.broadcast_to(
                            jnp.asarray(qq, jnp.float32), z[0].shape)
                            for qq in q])
                        res, Jq = sub["nl"](jnp, qv)
                        J = [[None] * nn_k for _ in range(nn_k)]
                        for ai in range(nn_k):
                            for bi in range(nn_k):
                                acc = None
                                for ci in range(nq_k):
                                    cf = sub["fq"][ci][bi]
                                    if cf == 0.0:
                                        continue
                                    term = Jq[ai, ci] * _f(cf)
                                    acc = term if acc is None else acc + term
                                J[ai][bi] = acc if acc is not None \
                                    else jnp.zeros_like(z[0])
                        resmax = jnp.abs(res[0])
                        for ai in range(1, nn_k):
                            resmax = jnp.maximum(resmax, jnp.abs(res[ai]))
                        # success, or stagnation at the float32 floor
                        done = (resmax < sub["tol"]) | (
                            (resmax >= 0.99 * prev_resmax)
                            & (resmax < sub["gate"]))
                        dz = _solve_rows(J, [res[ai] for ai in range(nn_k)])
                        bad = jnp.logical_not(jnp.isfinite(resmax))
                        for ai in range(nn_k):
                            bad = bad | jnp.logical_not(jnp.isfinite(dz[ai]))
                        move = jnp.logical_not(done | bad)
                        # clip the step: a bounded overshoot on the junction
                        # exponentials walks back in a few iterations instead
                        # of needing a crawl from multi-volt excursions
                        dz = [jnp.clip(d, -step_clip, step_clip) for d in dz]
                        z_new = jnp.stack([
                            jnp.where(move, z[ai] - dz[ai], z[ai])
                            for ai in range(nn_k)])
                        # Mosaic cannot carry i1 vectors through scf.while,
                        # so the convergence mask travels as float32 0/1
                        return z_new, done.astype(jnp.float32), resmax

                    # early-exit Newton: iterate while any lane is live --
                    # with previous-sample warm starts almost every sample
                    # finishes in 1-2 iterations, so the data-dependent exit
                    # directly multiplies throughput
                    def n_cond(st):
                        _, it, done, _ = st
                        return jnp.logical_and(it < K,
                                               jnp.logical_not(jnp.all(done > 0.5)))

                    def n_body(st):
                        zs, it, _, prev = st
                        z_new, done, resmax = newton_iter(zs, prev)
                        return (z_new, it + 1, done, resmax)

                    big = jnp.full(z0s.shape[1:], 3e38, jnp.float32)
                    zs_fin, _, done_fin, _ = jax.lax.while_loop(
                        n_cond, n_body,
                        (z0s, jnp.int32(0),
                         jnp.zeros(z0s.shape[1:], jnp.float32), big))

                    # rescue pass: lanes that failed restart from z~ = 0,
                    # i.e. the centering steady state -- the TPU-native
                    # stand-in for the reference's homotopy restart from the
                    # extrapolation origin (solvers.jl:268-296).  Without
                    # this a single transient failure poisons the warm start
                    # of every following sample.
                    def rescue(args):
                        zs0, done0 = args
                        zs_r = jnp.where(done0[None] > 0.5, zs0,
                                         jnp.zeros_like(zs0))
                        zs1, _, done1, _ = jax.lax.while_loop(
                            n_cond, n_body,
                            (zs_r, jnp.int32(0),
                             jnp.zeros(zs0.shape[1:], jnp.float32), big))
                        keep = done0[None] > 0.5
                        return (jnp.where(keep, zs0, zs1),
                                jnp.maximum(done0, done1))

                    zs_fin, done_fin = jax.lax.cond(
                        jnp.all(done_fin > 0.5),
                        lambda args: args, rescue, (zs_fin, done_fin))
                    z = [zs_fin[i1] for i1 in range(nn_k)]
                    fail_k = done_fin < 0.5
                    any_fail = fail_k if any_fail is None else (any_fail | fail_k)
                    for i1 in range(nn_k):
                        z_all[o + i1] = z[i1]
                # output row and state update (ref ACME.jl:699-714)
                for oi in range(ny):
                    acc = dotv(dy[oi], x_v)
                    acc = dotv(ey[oi], u_full, acc)
                    acc = dotv(fy[oi], z_all, acc)
                    val = _f(y0[oi]) if acc is None else acc + _f(y0[oi])
                    y_ref[t, oi] = jnp.broadcast_to(
                        jnp.asarray(val, jnp.float32), y_ref.shape[2:])
                x_new = []
                for xi in range(nx):
                    acc = dotv(a[xi], x_v)
                    acc = dotv(b[xi], u_full, acc)
                    acc = dotv(c[xi], z_all, acc)
                    x_new.append(_f(x0[xi]) if acc is None else acc + _f(x0[xi]))
                for xi in range(nx):
                    x_s[xi] = jnp.broadcast_to(
                        jnp.asarray(x_new[xi], jnp.float32), x_s.shape[1:])
                for zi in range(nn_total):
                    z_s[zi] = z_all[zi]
                if any_fail is not None:
                    fail_s[...] = fail_s[...] + any_fail.astype(jnp.int32)
                return 0

            jax.lax.fori_loop(0, Tc, sample, 0)

            @pl.when(step_i == pl.num_programs(0) - 1)
            def _fin():
                if nx:
                    x_out[...] = x_s[...]
                if nn_total:
                    z_out[...] = z_s[...]
                fail_out[...] = fail_s[...]

        return kernel, (nu_t, nu_l)

    def _compiled(self, S: int, T: int, Tc: int = None):
        if Tc is None:
            Tc = min(self.Tc, T)
        key = (S, T, Tc)
        if key in self._jit_cache:
            return self._jit_cache[key]
        assert T % Tc == 0
        nsteps = T // Tc
        kernel, (nu_t, nu_l) = self._build(S, Tc)
        nx, ny, nn_total = max(self.nx, 1), self.ny, max(self.nn_total, 1)
        dt = jnp.float32

        grid = (nsteps,)
        in_specs = [
                pl.BlockSpec((Tc, max(nu_t, 1)), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((max(nu_l, 1), S, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nx, S, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nn_total, S, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        out_specs = [
                pl.BlockSpec((Tc, max(ny, 1), S, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nx, S, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nn_total, S, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
        fn = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((T, max(ny, 1), S, LANE), dt),
                jax.ShapeDtypeStruct((nx, S, LANE), dt),
                jax.ShapeDtypeStruct((nn_total, S, LANE), dt),
                jax.ShapeDtypeStruct((S, LANE), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nx, S, LANE), dt),
                pltpu.VMEM((nn_total, S, LANE), dt),
                pltpu.VMEM((S, LANE), jnp.int32),
            ],
            interpret=self.interpret,
        )
        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    # -- public API -----------------------------------------------------------
    def initial_state(self, lanes: int, at_steady: bool = False):
        """Initial carry.  By default matches the reference (x = 0,
        z = initial operating point); with ``at_steady`` the run starts at
        the centering steady state (x~ = z~ = 0), skipping the transient."""
        m = self.model
        S = lanes // LANE
        x0v = (np.zeros(max(self.nx, 1)) if at_steady
               else np.concatenate([-self.x_ss, np.zeros(max(1 - self.nx, 0))]))
        x = np.broadcast_to(x0v.astype(np.float32)[:, None, None],
                            (max(self.nx, 1), S, LANE)).copy()
        if self.nn_total:
            z0 = (np.zeros(self.nn_total) if at_steady
                  else np.concatenate([np.asarray(z, float)
                                       for z in m.init_zs]) - self.z_ss)
        else:
            z0 = np.zeros(1)
        z = np.broadcast_to(z0.astype(np.float32)[:, None, None],
                            (max(self.nn_total, 1), S, LANE)).copy()
        return {"x": jnp.asarray(x), "z": jnp.asarray(z)}

    def run(self, u_time, lane_values, state=None):
        """u_time: (nu_t, T); lane_values: (L, nu_l); returns (y (L, ny, T),
        state, fail_counts (L,))."""
        u_time = np.asarray(u_time, float) - self.u_ss[list(self.time_idx)][:, None]
        u_time = u_time.astype(np.float32)
        lane_values = np.asarray(lane_values, float) - self.u_ss[list(self.lane_idx)]
        lane_values = lane_values.astype(np.float32)
        L = lane_values.shape[0] if lane_values.size else LANE
        if L % LANE:
            raise ValueError(f"lanes ({L}) must be a multiple of {LANE}")
        S = L // LANE
        T0 = u_time.shape[1]
        if state is None:
            state = self.initial_state(L)
        nu_t, nu_l = len(self.time_idx), len(self.lane_idx)
        lv = lane_values.T.reshape(nu_l, S, LANE) if nu_l \
            else np.zeros((1, S, LANE), np.float32)
        lv = jnp.asarray(lv)

        # split into a main part (multiple of the chunk size) plus an exact
        # tail kernel -- padding would silently advance the carried state
        # through fabricated samples
        Tc = min(self.Tc, max(T0, 1))
        T_main = (T0 // Tc) * Tc
        pieces = []
        if T_main:
            pieces.append((0, T_main, Tc))
        if T0 - T_main:
            pieces.append((T_main, T0 - T_main, T0 - T_main))

        ys = []
        fails_total = None
        x_cur, z_cur = state["x"], state["z"]
        # trace and execute with x64 disabled: the kernel is float32
        # throughout, and weak-typed python-float constants must not
        # promote anything to float64 (Mosaic rejects 64-bit scalars)
        with jax.enable_x64(False):
            for start, length, chunk in pieces:
                u_piece = u_time[:, start:start + length]
                u_in = u_piece.T if nu_t else np.zeros((length, 1), np.float32)
                fn = self._compiled(S, length, chunk)
                y, x_cur, z_cur, fails = fn(jnp.asarray(u_in), lv,
                                            x_cur, z_cur)
                ys.append(jnp.transpose(y, (2, 3, 1, 0)).reshape(
                    S * LANE, max(self.ny, 1), length))
                fails_total = fails if fails_total is None else fails_total + fails
        y = jnp.concatenate(ys, axis=2) if len(ys) > 1 else ys[0]
        y = y[:, :self.ny, :]
        return y, {"x": x_cur, "z": z_cur}, fails_total.reshape(-1)
