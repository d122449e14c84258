from .fused_erk import solve_fused_erk
from .fused_rkn import solve_fused_rkn
from .fused_rkc import solve_fused_rkc

__all__ = ["solve_fused_erk", "solve_fused_rkn", "solve_fused_rkc"]
