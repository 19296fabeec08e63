"""Host (numpy) runtime: the reference-semantics execution engine.

Implements the per-sample loop of /root/reference/src/ACME.jl:552-715 plus
steady-state and small-signal linearization (ACME.jl:474-550).  This is the
golden path the TPU engine (acme_tpu.engine) is validated against: variable
Newton iteration counts, homotopy fallback, solution caching -- exactly the
reference's behaviour, in float64.
"""

from __future__ import annotations

import warnings

import numpy as np

from .model import DiscreteModel
from .solvers import (HomotopySolver, ParametricNonLinEq, SimpleSolver,
                      linearize_solver)

__all__ = ["run", "ModelRunner", "steadystate", "steadystate_", "linearize"]


class ModelRunner:
    """Pre-allocated host runner (ref ACME.jl:570-604)."""

    def __init__(self, model: DiscreteModel, showprogress: bool = False):
        self.model = model
        self.showprogress = showprogress
        self.ucur = np.zeros(model.nu)
        self.ps = [np.zeros(model.np(i)) for i in range(model.nsubsystems)]
        self.ycur = np.zeros(model.ny)
        self.xnew = np.zeros(model.nx)
        self.z = np.zeros(model.nn())

    def run(self, u: np.ndarray, y: np.ndarray = None) -> np.ndarray:
        model = self.model
        u = np.asarray(u, float)
        if u.ndim != 2 or u.shape[0] != model.nu:
            raise ValueError(f"input matrix has {u.shape[0] if u.ndim == 2 else '?'} rows, "
                             f"but model has {model.nu} inputs")
        T = u.shape[1]
        if y is None:
            y = np.zeros((model.ny, T))
        elif y.shape != (model.ny, T):
            raise ValueError("output matrix has wrong shape")
        if not self.showprogress:
            for n in range(T):
                self.step(y, u, n)
            return y
        # progress bar on the hot loop (ref ACME.jl:653 ProgressMeter),
        # throttled to ~4 updates/s so it never dominates the run
        import sys
        import time
        t0 = last = time.time()
        for n in range(T):
            self.step(y, u, n)
            now = time.time()
            if now - last >= 0.25 or n == T - 1:
                last = now
                frac = (n + 1) / T
                bar = "#" * int(30 * frac)
                rate = (n + 1) / max(now - t0, 1e-9)
                eta = (T - n - 1) / max(rate, 1e-9)
                print(f"\rRunning model: {frac:4.0%} |{bar:<30s}| "
                      f"{n + 1}/{T} ({rate:,.0f} smp/s, ETA {eta:4.1f}s)",
                      end="", file=sys.stderr, flush=True)
        print(file=sys.stderr)
        return y

    def step(self, y, u, n):
        """One sample: ordered subsystem solves, output row, state update
        (ref ACME.jl:666-715)."""
        model = self.model
        self.ucur[:] = u[:, n]
        z = self.z
        z[:] = 0.0
        zoff = 0
        for idx in range(model.nsubsystems):
            p = self.ps[idx]
            if model.dqs[idx].shape[1] == 0:
                p[:] = 0.0
            else:
                p[:] = model.dqs[idx] @ model.x
            p += model.eqs[idx] @ self.ucur
            if idx > 0:
                p += model.fqprevs[idx] @ z
            zsub = model.solvers[idx].solve(p)
            if not model.solvers[idx].hasconverged():
                if np.all(np.isfinite(zsub)):
                    warnings.warn("Failed to converge while solving non-linear equation.")
                else:
                    raise RuntimeError("Failed to converge while solving non-linear "
                                       "equation, got non-finite result.")
            nn_i = model.nn(idx)
            z[zoff:zoff + nn_i] = zsub
            zoff += nn_i
        if model.ny > 0:
            self.ycur[:] = model.y0
            self.ycur += model.dy @ model.x
            self.ycur += model.ey @ self.ucur
            self.ycur += model.fy @ z
            y[:, n] = self.ycur
        if model.nx > 0:
            self.xnew[:] = model.x0
            self.xnew += model.a @ model.x
            self.xnew += model.b @ self.ucur
            self.xnew += model.c @ z
            model.x[:] = self.xnew


def run(model: DiscreteModel, u: np.ndarray, showprogress: bool = False) -> np.ndarray:
    """Run ``model`` on input ``u`` (one row per circuit input, one column per
    sample); returns the outputs in the same layout.  Model state is
    preserved across calls (ref ACME.jl:552-568)."""
    return ModelRunner(model, showprogress).run(u)


def steadystate(model: DiscreteModel, u=None, return_z: bool = False):
    """Steady-state state vector for constant input u (ref ACME.jl:474-497).

    With ``return_z`` also returns the steady nonlinear solution vector
    (used by the float32 fused runtime for operating-point centering)."""
    if u is None:
        u = np.zeros(model.nu)
    u = np.asarray(u, float)
    IA = np.eye(model.nx) - model.a
    steady_z = np.zeros(model.nn())
    zoff = 0
    for idx in range(model.nsubsystems):
        nn_i = model.nn(idx)
        zr = slice(zoff, zoff + nn_i)
        # dq/IA means dq @ inv(IA)
        dqIA = np.linalg.solve(IA.T, model.dqs[idx].T).T if model.nx > 0 \
            else np.zeros((model.np(idx), 0))
        steady_q0 = (model.q0s[idx]
                     + model.pexps[idx] @ ((dqIA @ model.b + model.eqs[idx]) @ u
                                           + (dqIA @ model.c + model.fqprevs[idx]) @ steady_z)
                     + (model.pexps[idx] @ dqIA @ model.x0 if model.nx > 0 else 0.0))
        fq_eff = (model.pexps[idx] @ dqIA @ model.c[:, zr] if model.nx > 0 else 0.0) \
            + model.fqs[idx]
        nl = model.nl_funcs[idx]

        def func(res, J, scratch, z, fq_eff=fq_eff, nl=nl):
            pfull = scratch[0]
            q = pfull + fq_eff @ z
            r, Jq = nl(np, q)
            res[:] = r
            scratch[1][:] = Jq
            J[:] = Jq @ fq_eff

        nleq = ParametricNonLinEq(func, nn=nn_i, np_=model.nq(idx))
        solver = HomotopySolver(nleq, np.zeros(model.nq(idx)), np.zeros(nn_i),
                                base=SimpleSolver)
        solver.set_resabstol(1e-15)
        steady_z[zr] = solver.solve(steady_q0)
        if not solver.hasconverged():
            raise RuntimeError("Failed to find steady state solution")
        zoff += nn_i
    xs = np.linalg.solve(IA, model.b @ u + model.c @ steady_z + model.x0) \
        if model.nx > 0 else np.zeros(0)
    if return_z:
        return xs, steady_z
    return xs


def operating_point(model: DiscreteModel, u=None, resabstol=1e-9):
    """Approximate steady operating point (x, z) for constant input ``u``,
    for float32 operating-point centering (ops/fused.py).

    Differs from :func:`steadystate` (the reference-faithful path,
    ACME.jl:474-497) in robustness, not meaning -- centering is exact for
    ANY center point, so this only needs to land *near* the trajectory:

    * singular ``I - A`` (e.g. a capacitor across a stiff source leaves an
      undriven, decoupled state: the chain-decomposed superover,
      ref test/runtests.jl:763-764 @test_broken) is solved minimum-norm
      via lstsq instead of raising;
    * the per-subsystem homotopy runs at a loose ``resabstol`` and a
      non-converged subsystem returns its best-effort z instead of
      raising.
    """
    if u is None:
        u = np.zeros(model.nu)
    u = np.asarray(u, float)
    IA = np.eye(model.nx) - np.asarray(model.a, float)

    def ia_solve(rhs):
        try:
            return np.linalg.solve(IA, rhs)
        except np.linalg.LinAlgError:
            return np.linalg.lstsq(IA, rhs, rcond=None)[0]

    steady_z = np.zeros(model.nn())
    zoff = 0
    for idx in range(model.nsubsystems):
        nn_i = model.nn(idx)
        zr = slice(zoff, zoff + nn_i)
        dqIA = ia_solve(np.asarray(model.dqs[idx], float).T).T \
            if model.nx > 0 else np.zeros((model.np(idx), 0))
        steady_q0 = (model.q0s[idx]
                     + model.pexps[idx] @ ((dqIA @ model.b + model.eqs[idx]) @ u
                                           + (dqIA @ model.c + model.fqprevs[idx]) @ steady_z)
                     + (model.pexps[idx] @ dqIA @ model.x0 if model.nx > 0 else 0.0))
        fq_eff = (model.pexps[idx] @ dqIA @ model.c[:, zr] if model.nx > 0 else 0.0) \
            + model.fqs[idx]
        nl = model.nl_funcs[idx]

        def func(res, J, scratch, z, fq_eff=fq_eff, nl=nl):
            pfull = scratch[0]
            q = pfull + fq_eff @ z
            r, Jq = nl(np, q)
            res[:] = r
            scratch[1][:] = Jq
            J[:] = Jq @ fq_eff

        nleq = ParametricNonLinEq(func, nn=nn_i, np_=model.nq(idx))
        solver = HomotopySolver(nleq, np.zeros(model.nq(idx)), np.zeros(nn_i),
                                base=SimpleSolver)
        solver.set_resabstol(float(resabstol))
        steady_z[zr] = solver.solve(steady_q0)
        zoff += nn_i
    xs = ia_solve(model.b @ u + model.c @ steady_z + model.x0) \
        if model.nx > 0 else np.zeros(0)
    return xs, steady_z


def steadystate_(model: DiscreteModel, u=None) -> np.ndarray:
    """steadystate! of the reference: also installs the state (ACME.jl:499-503)."""
    xs = steadystate(model, u)
    model.x[:] = xs
    return xs


def linearize(model: DiscreteModel, usteady=None) -> DiscreteModel:
    """Solver-free small-signal model around the steady state
    (ref ACME.jl:505-550)."""
    if usteady is None:
        usteady = np.zeros(model.nu)
    usteady = np.asarray(usteady, float)
    xsteady = steadystate(model, usteady)
    nsub = model.nsubsystems
    zranges = [None] * nsub
    dzdps = [None] * nsub
    dqlins = [None] * nsub
    eqlins = [None] * nsub
    zsteady = np.zeros(model.nn())
    zoff = 0
    x0 = model.x0.copy()
    a = model.a.copy()
    b = model.b.copy()
    y0 = model.y0.copy()
    dy = model.dy.copy()
    ey = model.ey.copy()

    for idx in range(nsub):
        psteady = (model.dqs[idx] @ xsteady + model.eqs[idx] @ usteady
                   + model.fqprevs[idx] @ zsteady)
        zsub, dzdps[idx] = linearize_solver(model.solvers[idx], psteady)
        nn_i = len(zsub)
        zsteady[zoff:zoff + nn_i] = zsub
        zranges[idx] = slice(zoff, zoff + nn_i)

        fqdzdps = [model.fqprevs[idx][:, zranges[n]] @ dzdps[n] for n in range(idx)]
        dqlins[idx] = model.dqs[idx] + sum((f @ d for f, d in zip(fqdzdps, dqlins[:idx])),
                                           np.zeros_like(model.dqs[idx]))
        eqlins[idx] = model.eqs[idx] + sum((f @ d for f, d in zip(fqdzdps, eqlins[:idx])),
                                           np.zeros_like(model.eqs[idx]))

        x0 += model.c[:, zranges[idx]] @ (zsub - dzdps[idx] @ psteady)
        a += model.c[:, zranges[idx]] @ dzdps[idx] @ dqlins[idx]
        b += model.c[:, zranges[idx]] @ dzdps[idx] @ eqlins[idx]

        y0 += model.fy[:, zranges[idx]] @ (zsub - dzdps[idx] @ psteady)
        dy += model.fy[:, zranges[idx]] @ dzdps[idx] @ dqlins[idx]
        ey += model.fy[:, zranges[idx]] @ dzdps[idx] @ eqlins[idx]

        zoff += nn_i

    mats = {"a": a, "b": b, "c": np.zeros((model.nx, 0)), "x0": x0,
            "dy": dy, "ey": ey, "fy": np.zeros((model.ny, 0)), "y0": y0,
            "pexps": [], "dqs": [], "eqs": [], "fqprevs": [], "fqs": [],
            "q0s": []}
    return DiscreteModel(_mats=mats, _nl_funcs=[], _solvers=[])
