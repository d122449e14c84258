from .fused_erk import solve_fused_erk
from .fused_rkn import solve_fused_rkn

__all__ = ["solve_fused_erk", "solve_fused_rkn"]
