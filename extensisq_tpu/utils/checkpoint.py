"""Checkpoint / resume for solver states.

The reference has no checkpointing (SURVEY.md section 5.4); its closest
mechanism is the stepwise OdeSolver API.  Here the explicit solver-state
pytree IS the checkpoint: every stepper family's state NamedTuple holds
the complete integration context (for SWAG that includes the full
divided-difference memory, for ESDIRK the Jacobian/LU cache and
controller mode), so serializing the leaves and restoring them resumes
an integration bit-exactly — through the host Stepper protocol or the
device driver alike.

No new dependency: plain ``numpy.savez``.  For multi-host / sharded
states, ``orbax.checkpoint`` accepts the same pytrees.
"""
import numpy as np
import jax


def state_to_arrays(state):
    """Flatten a solver-state NamedTuple to {field: np.ndarray}."""
    return {f: np.asarray(getattr(state, f)) for f in state._fields}


def save_state(path, state):
    """Serialize a solver state (any stepper family) to an .npz file."""
    np.savez(path, __state_type__=type(state).__name__,
             **state_to_arrays(state))


def load_state(path, like):
    """Restore a state saved by :func:`save_state`.

    ``like`` is a state of the same stepper (e.g. ``stepper.state`` of a
    freshly constructed host Stepper, or the template used for the
    device solve): it supplies the NamedTuple type, dtypes and shapes.
    """
    with np.load(path, allow_pickle=False) as z:
        name = str(z["__state_type__"])
        if name != type(like).__name__:
            raise ValueError(
                f"checkpoint holds a {name} state, expected "
                f"{type(like).__name__}")
        leaves = {}
        for f in like._fields:
            ref = getattr(like, f)
            arr = z[f]
            if arr.shape != np.shape(ref):
                raise ValueError(
                    f"checkpoint field {f!r} has shape {arr.shape}, "
                    f"expected {np.shape(ref)}")
            leaves[f] = jax.numpy.asarray(arr, np.asarray(ref).dtype)
    return type(like)(**leaves)
