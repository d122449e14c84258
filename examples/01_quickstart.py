"""Quickstart: the scipy-compatible API.

Counterpart of the reference's README example
(/root/reference/README.md:26-35): pass the method HANDLE, not a
string.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import numpy as np
import jax.numpy as jnp

from extensisq_tpu import solve_ivp, BS5


def rhs(t, y):
    """exponential decay with two coupled states"""
    return jnp.stack([-0.5 * y[0], -0.3 * y[1] + 0.1 * y[0]])


res = solve_ivp(rhs, (0.0, 10.0), [3.0, 4.0], method=BS5,
                rtol=1e-8, atol=1e-11, dense_output=True)
print("status:", res.message)
print("steps:", res.nsteps, " RHS evaluations:", res.nfev)
print("y(10) =", res.y[:, -1])

# dense output anywhere in the interval
ts = np.linspace(0, 10, 5)
print("dense:", np.asarray(res.sol(ts))[0])

# events with direction and terminal attributes
def crossing(t, y):
    return y[0] - 1.0
crossing.terminal = True
crossing.direction = -1

res = solve_ivp(rhs, (0.0, 10.0), [3.0, 4.0], method=BS5, events=crossing)
print("y[0] crossed 1.0 at t =", res.t_events[0][0])

# the stepwise OdeSolver protocol also works
solver = BS5(rhs, 0.0, [3.0, 4.0], 10.0)
solver.step()
print("one step:", solver.t, solver.step_size)
