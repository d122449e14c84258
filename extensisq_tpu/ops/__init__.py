from .fused_erk import solve_fused_erk

__all__ = ["solve_fused_erk"]
