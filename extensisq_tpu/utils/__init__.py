from .checkpoint import save_state, load_state, state_to_arrays  # noqa: F401
