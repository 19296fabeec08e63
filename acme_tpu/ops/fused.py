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


def _recip_safe(v):
    return jnp.where(v > 0, 1.0 / jnp.where(v > 0, v, 1.0), jnp.ones_like(v))


def _solve_rows(J, R, refine=1):
    """Solve the per-lane dense systems J X = R where J is a list of lists of
    (S,128) vectors and R is a list of right-hand sides (each a list of n
    vectors); one tiny system per lane, vectorized over lanes.

    Raw Newton Jacobians here reach condition numbers ~1e8 purely from unit
    disparity (junction conductances 1e-10..1e2 against unit voltage rows),
    unsolvable in float32 (cond * eps > 1).  Row/column inf-norm
    equilibration brings that to ~1e4-1e5; pivoted f32 elimination plus one
    iterative-refinement step then gives directions good to ~1e-4 relative,
    ample for Newton, with final accuracy set by the residual evaluation.
    The reference gets this for free by solving in f64 (solvers.jl:46-132).

    n==1,2: closed form.  n>=3: Gaussian elimination with per-lane partial
    pivoting expressed as where-selects (branch-free)."""
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

    rs = []
    for i in range(n):
        mx = jnp.abs(J[i][0])
        for jj in range(1, n):
            mx = jnp.maximum(mx, jnp.abs(J[i][jj]))
        rs.append(_recip_safe(mx))
    Jr = [[J[i][jj] * rs[i] for jj in range(n)] for i in range(n)]
    cs = []
    for jj in range(n):
        mx = jnp.abs(Jr[0][jj])
        for i in range(1, n):
            mx = jnp.maximum(mx, jnp.abs(Jr[i][jj]))
        cs.append(_recip_safe(mx))
    Js = [[Jr[i][jj] * cs[jj] for jj in range(n)] for i in range(n)]
    Rs = [[R[j][i] * rs[i] for i in range(n)] for j in range(m)]
    Y = _solve_raw(Js, Rs)
    X = [[Y[j][jj] * cs[jj] for jj in range(n)] for j in range(m)]
    # one iterative-refinement step (n is tiny, re-elimination is cheap)
    R2 = []
    for j in range(m):
        r2 = []
        for i in range(n):
            acc = R[j][i]
            for jj in range(n):
                acc = acc - J[i][jj] * X[j][jj]
            r2.append(acc * rs[i])
        R2.append(r2)
    E = _solve_raw(Js, R2)
    X = [[X[j][jj] + E[j][jj] * cs[jj] for jj in range(n)] for j in range(m)]
    for _ in range(refine - 1):
        R2 = []
        for j in range(m):
            r2 = []
            for i in range(n):
                acc = R[j][i]
                for jj in range(n):
                    acc = acc - J[i][jj] * X[j][jj]
                r2.append(acc * rs[i])
            R2.append(r2)
        E = _solve_raw(Js, R2)
        X = [[X[j][jj] + E[j][jj] * cs[jj] for jj in range(n)]
             for j in range(m)]
    return X


def _solve_raw(J, R):
    """Pivoted elimination on vector rows; J (n x n), R list of m RHS."""
    n = len(J)
    m = len(R)
    A = [J[i][:] + [R[j][i] for j in range(m)] for i in range(n)]
    w = n + m
    for k in range(n):
        best = A[k]
        best_abs = jnp.abs(A[k][k])
        for i in range(k + 1, n):
            cand_abs = jnp.abs(A[i][k])
            take = cand_abs > best_abs
            new_best = [jnp.where(take, A[i][c], best[c]) for c in range(w)]
            A[i] = [jnp.where(take, best[c], A[i][c]) for c in range(w)]
            best = new_best
            best_abs = jnp.maximum(cand_abs, best_abs)
        A[k] = best
        inv = 1.0 / A[k][k]
        for i in range(k + 1, n):
            fct = A[i][k] * inv
            tail = [A[i][c] - fct * A[k][c] for c in range(k, w)]
            A[i] = [jnp.zeros_like(fct)] * k + tail
    X = [[None] * n for _ in range(m)]
    for i in range(n - 1, -1, -1):
        inv = 1.0 / A[i][i]
        for j in range(m):
            acc = A[i][n + j]
            for c in range(i + 1, n):
                acc = acc - A[i][c] * X[j][c]
            X[j][i] = acc * inv
    return X


class FusedRunner:
    """Compile a DiscreteModel into a fused Pallas sweep runner.

    run(u_time (nu_t, T), lane_values (L, nu_l), state=None)
      -> (y (L, ny, T), state, fail_counts (L,))

    Inputs listed in ``lane_input_idx`` come from per-lane constants (the
    sweep axis); the rest from the shared time series.  L must be a multiple
    of 128.
    """

    def __init__(self, model, lane_input_idx: Sequence[int] = (), *,
                 newton_iters: int = 64, tol: float = 1e-9,
                 step_clip: float = 1.0, time_chunk: int = 512,
                 interpret: bool = False, center: bool = True,
                 center_u=None, extrapolate: bool = True, refine: int = 1):
        self.model = model
        self.K = int(newton_iters)
        self.tol = float(tol)
        self.step_clip = float(step_clip)
        self.Tc = int(time_chunk)
        self.interpret = interpret
        self.extrapolate = bool(extrapolate)
        self.refine = int(refine)
        self.lane_idx = tuple(int(i) for i in lane_input_idx)
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
        self.x_ss = np.zeros(model.nx)
        self.z_ss = np.zeros(self.nn_total)
        if center and (model.nx or self.nn_total):
            try:
                from ..runtime import steadystate
                self.x_ss, self.z_ss = steadystate(model, self.u_ss,
                                                   return_z=True)
            except Exception:
                self.u_ss = np.zeros(model.nu)  # centering unavailable
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
        self.dzdp0 = []
        off = 0
        for kk in range(self.nsub):
            nn_k, np_k = model.nn(kk), model.np(kk)
            q0 = (np.asarray(model.q0s[kk], float)
                  + np.asarray(model.pexps[kk], float)
                  @ (np.asarray(model.dqs[kk], float) @ self.x_ss
                     + np.asarray(model.eqs[kk], float) @ self.u_ss
                     + np.asarray(model.fqprevs[kk], float) @ self.z_ss)
                  + np.asarray(model.fqs[kk], float) @ self.z_ss[off:off + nn_k])
            self.q0_c.append(q0)
            off += nn_k
            # per-subsystem tolerances: the float32 rounding floor of this
            # subsystem's residual differs by orders of magnitude between
            # subsystems (volt-scale pot rows vs mA-scale junction rows).
            # Estimate it from the term magnitudes |Jq| |q| at the operating
            # point (NOT from res(q0_c), which is only ~0 when the centering
            # steady state is exactly consistent -- for chain-coupled models
            # the reference's own steady state is not, test/runtests.jl:763).
            # tol = success; gate = "stagnated at the floor, accept"; above
            # the gate a lane is flagged non-converged (the reference's
            # warning path).
            res, Jq = model.nl_funcs[kk](np, q0)
            if res.size:
                term_scale = float(np.max(np.abs(Jq) @ np.abs(q0) + np.abs(res)))
            else:
                term_scale = 0.0
            floor = 1.2e-7 * term_scale  # f32 eps * term magnitude
            self.tols.append(max(self.tol, 8.0 * floor))
            self.gates.append(max(96.0 * floor, 32.0 * self.tol))
            # initial extrapolation sensitivity at the operating point
            # (solvers.jl:164-178)
            J = Jq @ np.asarray(model.fqs[kk], float)
            Jp = Jq @ np.asarray(model.pexps[kk], float)
            try:
                d0 = -np.linalg.solve(J, Jp)
            except np.linalg.LinAlgError:
                d0 = np.zeros((nn_k, np_k))
            self.dzdp0.append(d0)

    # -- kernel construction --------------------------------------------------
    def _build(self, S: int, Tc: int, T0: int):
        m = self.model
        nx, ny, nn_total = self.nx, self.ny, self.nn_total
        np_total, dz_total = self.np_total, self.dz_total
        K, step_clip = self.K, self.step_clip
        extrap = self.extrapolate
        refine = self.refine
        a = np.asarray(m.a, float)
        b = np.asarray(m.b, float)
        c = np.asarray(m.c, float)
        x0 = self.x0_c
        dy = np.asarray(m.dy, float)
        ey = np.asarray(m.ey, float)
        fy = np.asarray(m.fy, float)
        y0 = self.y0_c
        subs = []
        zoff = poff = doff = 0
        for kk in range(self.nsub):
            subs.append(dict(
                dq=np.asarray(m.dqs[kk], float), eq=np.asarray(m.eqs[kk], float),
                fqprev=np.asarray(m.fqprevs[kk], float),
                fq=np.asarray(m.fqs[kk], float),
                pexp=np.asarray(m.pexps[kk], float),
                q0=self.q0_c[kk], nl=m.nl_funcs[kk],
                tol=self.tols[kk], gate=self.gates[kk],
                off=zoff, poff=poff, doff=doff,
                nn=m.nn(kk), np=m.np(kk), nq=m.nq(kk)))
            zoff += m.nn(kk)
            poff += m.np(kk)
            doff += m.nn(kk) * m.np(kk)
        time_idx, lane_idx = self.time_idx, self.lane_idx
        nu_t, nu_l = len(time_idx), len(lane_idx)

        def dotv(coeffs, vecs, init=None):
            """sum_j coeffs[j]*vecs[j] with compile-time scalar coefficients;
            structural zeros are skipped (the model's sparsity is baked into
            the instruction stream)."""
            acc = init
            for cf, v in zip(coeffs, vecs):
                if cf == 0.0 or v is None:
                    continue
                term = _f(cf) * v
                acc = term if acc is None else acc + term
            return acc

        def kernel(u_ref, lane_ref, x_in, z_in, zw_in, wp_in, dzdp_in,
                   y_ref, x_out, z_out, zw_out, wp_out, dzdp_out, fail_out,
                   x_s, z_s, zw_s, wp_s, dzdp_s, fail_s):
            step_i = pl.program_id(0)

            @pl.when(step_i == 0)
            def _init():
                if nx:
                    x_s[...] = x_in[...]
                if nn_total:
                    z_s[...] = z_in[...]
                    zw_s[...] = zw_in[...]
                if np_total:
                    wp_s[...] = wp_in[...]
                if dz_total and extrap:
                    dzdp_s[...] = dzdp_in[...]
                fail_s[...] = jnp.zeros_like(fail_s)

            lane_vals = [lane_ref[j] for j in range(nu_l)]

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
                x_v = [x_s[j] for j in range(nx)]
                z_all = [z_s[j] for j in range(nn_total)]
                any_fail = None
                for sub in subs:
                    nn_k, np_k, nq_k = sub["nn"], sub["np"], sub["nq"]
                    o, po, do = sub["off"], sub["poff"], sub["doff"]
                    # p = Dq x + Eq u + Fqprev z  (ref ACME.jl:681-686)
                    p = []
                    for i in range(np_k):
                        acc = dotv(sub["dq"][i], x_v)
                        acc = dotv(sub["eq"][i], u_full, acc)
                        acc = dotv(sub["fqprev"][i], z_all, acc)
                        p.append(acc if acc is not None
                                 else jnp.zeros_like(z_all[o]))
                    pfull = []
                    for ci in range(nq_k):
                        acc = dotv(sub["pexp"][ci], p)
                        base = _f(sub["q0"][ci])
                        pfull.append(base if acc is None else acc + base)

                    # extrapolated warm start (solvers.jl:209-215)
                    if extrap and np_k:
                        dp = [p[i] - wp_s[po + i] for i in range(np_k)]
                        z0 = []
                        for i1 in range(nn_k):
                            acc = zw_s[o + i1]
                            for i2 in range(np_k):
                                acc = acc + dzdp_s[do + i1 * np_k + i2] * dp[i2]
                            z0.append(acc)
                    else:
                        z0 = [zw_s[o + i1] for i1 in range(nn_k)]
                    z0s = jnp.stack([jnp.broadcast_to(
                        jnp.asarray(zz, jnp.float32), z_all[o].shape)
                        for zz in z0])

                    def eval_at(z):
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
                        return res, J, Jq, resmax

                    def newton_iter(zs, prev_resmax):
                        z = [zs[i1] for i1 in range(nn_k)]
                        res, J, _, resmax = eval_at(z)
                        # success, or stagnation at the float32 floor
                        done = (resmax < sub["tol"]) | (
                            (resmax >= 0.99 * prev_resmax)
                            & (resmax < sub["gate"]))
                        dz = _solve_rows(J, [[res[ai] for ai in range(nn_k)]],
                                         refine=refine)[0]
                        bad = jnp.logical_not(jnp.isfinite(resmax))
                        for ai in range(nn_k):
                            bad = bad | jnp.logical_not(jnp.isfinite(dz[ai]))
                        move = jnp.logical_not(done | bad)
                        # bounded steps: an overshoot on the junction
                        # exponentials walks back in a few iterations instead
                        # of crawling from multi-volt excursions
                        dz = [jnp.clip(d, -step_clip, step_clip) for d in dz]
                        z_new = jnp.stack([
                            jnp.where(move, z[ai] - dz[ai], z[ai])
                            for ai in range(nn_k)])
                        # Mosaic cannot carry i1 vectors through scf.while:
                        # the mask travels as float32 0/1
                        return z_new, done.astype(jnp.float32), resmax

                    def n_cond(st):
                        _, it, done, _ = st
                        return jnp.logical_and(
                            it < K, jnp.logical_not(jnp.all(done > 0.5)))

                    def n_body(st):
                        zs, it, _, prev = st
                        z_new, done, resmax = newton_iter(zs, prev)
                        return (z_new, it + 1, done, resmax)

                    big = jnp.full(z0s.shape[1:], 3e38, jnp.float32)
                    zs_fin, _, done_fin, _ = jax.lax.while_loop(
                        n_cond, n_body,
                        (z0s, jnp.int32(0),
                         jnp.zeros(z0s.shape[1:], jnp.float32), big))

                    # rescue: failed lanes restart from z~ = 0 (the centering
                    # operating point) -- the in-kernel stand-in for the
                    # reference's homotopy restart (solvers.jl:268-296)
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
                    conv = done_fin > 0.5
                    fail_k = jnp.logical_not(conv)
                    any_fail = fail_k if any_fail is None else (any_fail | fail_k)
                    for i1 in range(nn_k):
                        z_all[o + i1] = z[i1]

                    # move the extrapolation origin on converged, finite,
                    # non-singular solves only (solvers.jl:220-234)
                    if extrap and np_k:
                        _, J, Jq, _ = eval_at(z)
                        Jp = [[None] * np_k for _ in range(nn_k)]
                        for ai in range(nn_k):
                            for bi in range(np_k):
                                acc = None
                                for ci in range(nq_k):
                                    cf = sub["pexp"][ci][bi]
                                    if cf == 0.0:
                                        continue
                                    term = Jq[ai, ci] * _f(cf)
                                    acc = term if acc is None else acc + term
                                Jp[ai][bi] = acc if acc is not None \
                                    else jnp.zeros_like(z[0])
                        cols = _solve_rows(
                            J, [[Jp[ai][bi] for ai in range(nn_k)]
                                for bi in range(np_k)], refine=refine)
                        ok = conv
                        for bi in range(np_k):
                            for ai in range(nn_k):
                                ok = ok & jnp.isfinite(cols[bi][ai])
                        for i1 in range(nn_k):
                            zw_s[o + i1] = jnp.where(ok, z[i1], zw_s[o + i1])
                        for i2 in range(np_k):
                            wp_s[po + i2] = jnp.where(ok, p[i2], wp_s[po + i2])
                        for i1 in range(nn_k):
                            for i2 in range(np_k):
                                di = do + i1 * np_k + i2
                                dzdp_s[di] = jnp.where(
                                    ok, -cols[i2][i1], dzdp_s[di])
                    else:
                        for i1 in range(nn_k):
                            zw_s[o + i1] = jnp.where(conv, z[i1], zw_s[o + i1])

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
                    x_new.append(_f(x0[xi]) if acc is None
                                 else acc + _f(x0[xi]))
                for xi in range(nx):
                    x_s[xi] = jnp.broadcast_to(
                        jnp.asarray(x_new[xi], jnp.float32), x_s.shape[1:])
                for zi in range(nn_total):
                    z_s[zi] = z_all[zi]
                if any_fail is not None:
                    fail_s[...] = fail_s[...] + any_fail.astype(jnp.int32)

            jax.lax.fori_loop(0, Tc, sample, 0)

            @pl.when(step_i == pl.num_programs(0) - 1)
            def _fin():
                if nx:
                    x_out[...] = x_s[...]
                if nn_total:
                    z_out[...] = z_s[...]
                    zw_out[...] = zw_s[...]
                if np_total:
                    wp_out[...] = wp_s[...]
                if dz_total and extrap:
                    dzdp_out[...] = dzdp_s[...]
                fail_out[...] = fail_s[...]

        return kernel, (nu_t, nu_l)

    def _compiled(self, S: int, T0: int):
        """Kernel for ``T0`` true samples.  The time axis is padded to a
        multiple of the (8-aligned, SMEM-tileable) chunk; padded samples are
        masked inside the kernel so they never advance the state."""
        Tc = min(self.Tc, -(-T0 // 8) * 8)
        Tc = max(8, (Tc // 8) * 8)
        T = -(-T0 // Tc) * Tc
        key = (S, T0)
        if key in self._jit_cache:
            return self._jit_cache[key], T
        nsteps = T // Tc
        kernel, (nu_t, nu_l) = self._build(S, Tc, T0)
        nx = max(self.nx, 1)
        ny = self.ny
        nn_total = max(self.nn_total, 1)
        np_total = max(self.np_total, 1)
        dz_total = max(self.dz_total, 1)
        dt = jnp.float32

        def full(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        in_specs = [
            pl.BlockSpec((Tc, max(nu_t, 1)), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            full((max(nu_l, 1), S, LANE)),
            full((nx, S, LANE)),
            full((nn_total, S, LANE)),
            full((nn_total, S, LANE)),
            full((np_total, S, LANE)),
            full((dz_total, S, LANE)),
        ]
        out_specs = [
            pl.BlockSpec((Tc, max(ny, 1), S, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((nx, S, LANE)),
            full((nn_total, S, LANE)),
            full((nn_total, S, LANE)),
            full((np_total, S, LANE)),
            full((dz_total, S, LANE)),
            full((S, LANE)),
        ]
        fn = pl.pallas_call(
            kernel,
            grid=(nsteps,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((T, max(ny, 1), S, LANE), dt),
                jax.ShapeDtypeStruct((nx, S, LANE), dt),
                jax.ShapeDtypeStruct((nn_total, S, LANE), dt),
                jax.ShapeDtypeStruct((nn_total, S, LANE), dt),
                jax.ShapeDtypeStruct((np_total, S, LANE), dt),
                jax.ShapeDtypeStruct((dz_total, S, LANE), dt),
                jax.ShapeDtypeStruct((S, LANE), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nx, S, LANE), dt),
                pltpu.VMEM((nn_total, S, LANE), dt),
                pltpu.VMEM((nn_total, S, LANE), dt),
                pltpu.VMEM((np_total, S, LANE), dt),
                pltpu.VMEM((dz_total, S, LANE), dt),
                pltpu.VMEM((S, LANE), jnp.int32),
            ],
            interpret=self.interpret,
        )
        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted, T

    # -- public API -------------------------------------------------------
    def initial_state(self, lanes: int, at_steady: bool = False):
        """Initial carry.  Default matches the reference (x = 0, z = initial
        operating point); ``at_steady`` starts at the centering steady state
        (x~ = z~ = 0), skipping the power-up transient."""
        m = self.model
        S = lanes // LANE

        def tile(v, n):
            v = np.asarray(v, np.float32).reshape(-1)
            if v.size == 0:
                v = np.zeros(n, np.float32)
            return jnp.asarray(np.broadcast_to(
                v[:, None, None], (v.size, S, LANE)).copy())

        x0v = (np.zeros(max(self.nx, 1)) if at_steady or self.nx == 0
               else -self.x_ss)
        if self.nn_total:
            z0 = (np.zeros(self.nn_total) if at_steady
                  else np.concatenate([np.asarray(z, float)
                                       for z in m.init_zs]) - self.z_ss)
        else:
            z0 = np.zeros(1)
        dz0 = (np.concatenate([d.reshape(-1) for d in self.dzdp0])
               if self.dz_total else np.zeros(1))
        return {"x": tile(x0v, max(self.nx, 1)),
                "z": tile(z0, max(self.nn_total, 1)),
                "zw": tile(z0, max(self.nn_total, 1)),
                "wp": tile(np.zeros(max(self.np_total, 1)),
                           max(self.np_total, 1)),
                "dzdp": tile(dz0, max(self.dz_total, 1))}

    def run(self, u_time, lane_values, state=None):
        """u_time: (nu_t, T); lane_values: (L, nu_l); returns
        (y (L, ny, T), state, fail_counts (L,))."""
        u_time = np.asarray(u_time, float) \
            - self.u_ss[list(self.time_idx)][:, None]
        u_time = u_time.astype(np.float32)
        lane_values = np.asarray(lane_values, float) \
            - self.u_ss[list(self.lane_idx)]
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
        # trace and execute with x64 disabled: the kernel is float32
        # throughout and weak-typed python floats must not promote anything
        # to float64 (Mosaic rejects 64-bit scalars)
        with jax.enable_x64(False):
            fn, T = self._compiled(S, T0)
            u_pad = np.zeros((T, max(nu_t, 1)), np.float32)
            if nu_t:
                u_pad[:T0, :] = u_time.T
            y, x_o, z_o, zw_o, wp_o, dz_o, fails = fn(
                jnp.asarray(u_pad), jnp.asarray(lv),
                state["x"], state["z"], state["zw"], state["wp"],
                state["dzdp"])
        y = jnp.transpose(y, (2, 3, 1, 0)).reshape(S * LANE,
                                                   max(self.ny, 1), T)
        y = y[:, :self.ny, :T0]
        state = {"x": x_o, "z": z_o, "zw": zw_o, "wp": wp_o, "dzdp": dz_o}
        return y, state, fails.reshape(-1)
