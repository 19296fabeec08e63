"""TPU compute kernels: batched small linear solves, masked Newton/homotopy,
and (optionally) Pallas-fused scan bodies."""

from .linsolve import solve_dense
from .newton import make_subsystem_solver

__all__ = ["solve_dense", "make_subsystem_solver"]
