"""Checkpoint/resume: the solver-state pytree is the checkpoint
(SURVEY.md section 5.4)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from extensisq_tpu import solve_ivp, SWAG, Kv3I
from extensisq_tpu.utils import save_state, load_state


def vdp(t, y):
    return jnp.stack([y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0]])


def test_checkpoint_resume_bit_exact(tmp_path):
    """Stop a SWAG solve mid-flight (full divided-difference memory in
    the state), serialize, restore into a fresh solver, continue:
    bitwise-identical to the uninterrupted run."""
    y0 = jnp.array([2.0, 0.0])
    ref = SWAG(vdp, 0.0, y0, 20.0, rtol=1e-8, atol=1e-10)
    while ref.status == "running":
        ref.step()

    s = SWAG(vdp, 0.0, y0, 20.0, rtol=1e-8, atol=1e-10)
    for _ in range(50):
        s.step()
    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, s.state)

    s2 = SWAG(vdp, 0.0, y0, 20.0, rtol=1e-8, atol=1e-10)
    s2.state = load_state(path, s2.state)
    while s2.status == "running":
        s2.step()

    assert float(s2.t) == float(ref.t)
    np.testing.assert_array_equal(np.asarray(s2.y), np.asarray(ref.y))
    # counters resumed, not reset
    assert int(s2.state.nsteps) == int(ref.state.nsteps)


def test_checkpoint_type_and_shape_guards(tmp_path):
    y0 = jnp.array([2.0, 0.0])
    s = SWAG(vdp, 0.0, y0, 20.0, rtol=1e-8, atol=1e-10)
    s.step()
    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, s.state)

    other = Kv3I(vdp, 0.0, y0, 20.0, rtol=1e-6, atol=1e-9)
    import pytest
    with pytest.raises(ValueError, match="state"):
        load_state(path, other.state)
