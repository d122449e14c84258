"""Long-horizon integration patterns: windowing and checkpointing.

Two tools for integrations too long for one device program:

1. ``solve_windowed`` — chunk the horizon into jit calls, feeding the
   terminal state forward.  The window edges are jit arguments, so one
   compilation serves every chunk.
2. ``utils.save_state``/``load_state`` — the solver-state pytree is the
   complete integration context; serialize it mid-flight and resume
   later (even in another process) bitwise-exactly.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from extensisq_tpu import solve_windowed, SWAG
from extensisq_tpu.utils import save_state, load_state


def vdp(t, y, mu=100.0):
    return jnp.stack([y[1], mu * (1.0 - y[0] ** 2) * y[1] - y[0]])


# --- windowed ensemble over a long horizon --------------------------------
B = 64
Y0 = jnp.stack([jnp.linspace(1.9, 2.1, B), jnp.zeros(B)], axis=1)
out = solve_windowed(vdp, (0.0, 200.0), Y0, n_windows=8, method=SWAG,
                     ensemble=True, rtol=1e-6, atol=1e-9,
                     max_steps=200_000)
print("windowed ensemble:", out.y.shape,
      "all finished:", bool(jnp.all(out.status == 1)),
      "max steps/member:", int(out.nsteps.max()))

# --- checkpoint / resume (host stepwise protocol) -------------------------
s = SWAG(vdp, 0.0, jnp.array([2.0, 0.0]), 50.0, rtol=1e-8, atol=1e-10)
for _ in range(200):
    s.step()
save_state("/tmp/vdp_ckpt.npz", s.state)
print(f"checkpointed at t={s.t:.3f} after {int(s.state.nsteps)} steps")

s2 = SWAG(vdp, 0.0, jnp.array([2.0, 0.0]), 50.0, rtol=1e-8, atol=1e-10)
s2.state = load_state("/tmp/vdp_ckpt.npz", s2.state)
while s2.status == "running":
    s2.step()
print(f"resumed -> t={s2.t:.1f}, y={np.asarray(s2.y)}, "
      f"total steps {int(s2.state.nsteps)}")
