"""Custom ops: block-tridiagonal KKT solves (XLA scan + Pallas TPU)."""
from .tridiag import (block_tridiag_dense, block_tridiag_factor,
                      block_tridiag_matvec, block_tridiag_solve,
                      block_tridiag_solve_factored)

__all__ = [
    "block_tridiag_dense",
    "block_tridiag_factor",
    "block_tridiag_matvec",
    "block_tridiag_solve",
    "block_tridiag_solve_factored",
]
