"""Differentiable trajectory optimizers (layer L3 of SURVEY.md §1).

- `al_mpc.ALMPC`: batched augmented-Lagrangian MPC (primary solver,
  counterpart of `qpth/AL_mpc.py`), block-tridiagonal Newton inner
  solver with implicit custom_vjp backward.
- `fp`: Anderson / Broyden fixed-point accelerators for the DEQ layer
  (counterpart of `deqmpc/fp_solvers.py`).
"""
from .al_core import ObstacleSet, compute_cost, full_residuals, merit_function
from .al_mpc import ALMPC
from .ip_mpc import IPMPC
from .pdipm import qp_layer, qp_solve
from .types import ALState, LinDx, QuadCost

__all__ = [
    "ALMPC",
    "IPMPC",
    "qp_layer",
    "qp_solve",
    "ALState",
    "LinDx",
    "ObstacleSet",
    "QuadCost",
    "compute_cost",
    "full_residuals",
    "merit_function",
]
