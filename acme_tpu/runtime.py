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


def operating_point(model: DiscreteModel, u=None, resabstol=1e-9,
                    runin=2048):
    """Approximate steady operating point (x, z) for constant input ``u``,
    for float32 operating-point centering (ops/fused.py).

    Differs from :func:`steadystate` (the reference-faithful path,
    ACME.jl:474-497) in robustness and *branch selection*, not meaning --
    centering is exact for ANY center point, so this only needs to land
    near the trajectory, but it must land on the trajectory's solution
    BRANCH (a steady solve homotopied from zero can converge to a
    different root of a weakly-determined subsystem -- the dead-zone diode
    trio of the chain-decomposed superover -- and a wrong-root center
    poisons every fused warm start).  Approach:

    1. **Run-in**: run the real dynamics for ``runin`` samples at constant
       ``u`` -- on-branch by construction; gives (x_run, z_run).
    2. **Warm steady solve**: per-subsystem Newton started at z_run (no
       homotopy restart from zero), so it converges to the *nearby* root;
       a non-converged subsystem keeps its run-in value instead of
       raising.
    3. **Null-mode handling**: eigenvalue-1 modes of A (a capacitor across
       a stiff source leaves an undriven state: the reference's own steady
       state is broken there, test/runtests.jl:763-764 @test_broken) are
       constants of motion; their center value is matched to the
       trajectory (w^T x = w^T x_run for left null vectors w of I - A)
       rather than chosen minimum-norm.
    """
    if u is None:
        u = np.zeros(model.nu)
    u = np.asarray(u, float)
    nx = model.nx

    # 1. run-in (state is restored; solver warm origins legitimately move)
    x_run = np.zeros(nx)
    z_run = np.zeros(model.nn())
    if runin and (nx or model.nn()):
        x_save = model.x.copy()
        try:
            model.x[:] = 0.0
            runner = ModelRunner(model)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                runner.run(np.ascontiguousarray(
                    np.broadcast_to(u[:, None], (model.nu, int(runin)))))
            x_run = model.x.copy()
            z_run = runner.z.copy()
        except Exception:
            x_run = np.zeros(nx)
            z_run = np.zeros(model.nn())
        finally:
            model.x[:] = x_save

    # trajectory-matched affine solve X(rhs) with (I-A) X = rhs and
    # w^T X = w^T x_run on the left null space:
    #   X(rhs) = (M - K M) rhs + K x_run,  M = pinv(I-A),
    #   K = N (W^T N)^{-1} W^T  (N/W right/left null bases)
    if nx:
        IA = np.eye(nx) - np.asarray(model.a, float)
        U_, s_, Vt_ = np.linalg.svd(IA)
        cutoff = max(IA.shape) * np.finfo(float).eps * (s_[0] if s_.size else 1.0)
        rank = int(np.sum(s_ > cutoff))
        M = (Vt_[:rank].T / s_[:rank]) @ U_[:, :rank].T
        if rank < nx:
            N_ = Vt_[rank:].T
            W_ = U_[:, rank:]
            K = N_ @ np.linalg.solve(W_.T @ N_, W_.T)
            MM = M - K @ M
            x_off = K @ x_run
        else:
            MM = M
            x_off = np.zeros(nx)
    else:
        MM = np.zeros((0, 0))
        x_off = np.zeros(0)

    # 2. z center = the run-in value itself.  A warm per-subsystem steady
    # refinement was tried and REVERTED: the (I-A)^-1-folded steady system
    # has spurious fixed points (non-physical DK roots: the refined point
    # held y = 3.23 V where the trajectory's steady output is 0), and
    # Newton on the folded system hops to them even from a near-trajectory
    # start.  The run-in value is within the remaining-transient distance
    # of steady, which centering tolerates by construction.
    steady_z = z_run
    # x center = trajectory-matched fixed point of the LINEAR part at
    # z = z_run (projects out the already-settled linear transient)
    xs = (MM @ (model.b @ u + model.c @ steady_z + model.x0) + x_off) \
        if nx else np.zeros(0)
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
