"""solve_fused_sharded: the fused whole-integration kernels scaled
over the member axis of a device mesh (shard_map, zero collectives).
Per-member results must be bit-identical to the unsharded kernel —
members are independent lanes, sharding only changes which device
holds them (interpret mode on the conftest's 8 virtual CPU devices;
the compiled path runs on TPU pods)."""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh

from extensisq_tpu.ops import solve_fused
from extensisq_tpu.parallel import solve_fused_sharded
from extensisq_tpu import BS5, SSV2stab

pytestmark = pytest.mark.slow  # interpret-mode fused kernels: multi-minute


def _mesh():
    return Mesh(np.array(jax.devices()), ("m",))


def vdp(t, y):
    return jnp.stack([y[1], 3.0 * (1 - y[0] ** 2) * y[1] - y[0]])


def test_fused_sharded_erk_matches_unsharded():
    B = 16
    Y0 = np.stack([np.linspace(1.5, 2.5, B), np.zeros(B)],
                  axis=1).astype(np.float32)
    tq = [2.0, 5.0, 8.0]

    def g(t, y):
        return y[1] - 1.2
    g.terminal = False
    g.direction = 0.0

    kw = dict(method=BS5, rtol=1e-4, atol=1e-6, t_eval=tq,
              events=[g], interpret=True)
    ref = solve_fused(vdp, (0.0, 10.0), Y0, **kw)
    out = solve_fused_sharded(vdp, (0.0, 10.0), Y0, _mesh(), **kw)

    assert len(out) == len(ref) == 8  # y,st,ns,nf,y_eval,t_ev,y_ev,n_ev
    names = ["y", "status", "nsteps", "nfev", "y_eval",
             "t_events", "y_events", "n_events"]

    for nm, a, b in zip(names, out, ref):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, nm
        assert np.array_equal(a, b, equal_nan=True), nm
    assert np.all(np.asarray(out[1]) == 1)
    assert int(np.asarray(out[7]).sum()) > 0     # the event fired


def test_fused_sharded_rkc_ensemble():
    from extensisq_tpu.ops.fused_rkc import roll

    ny, nx = 8, 128
    alpha, dx = 0.02, 1.0 / nx

    def heat(t, u, p):
        lap = (roll(u, 1, 0) + roll(u, -1, 0)
               + roll(u, 1, 1) + roll(u, -1, 1) - 4.0 * u) / dx ** 2
        return alpha * lap - p[0] * u

    rho = 8.0 * alpha / dx ** 2 + 4.0
    B = 8
    xg = np.linspace(0, 1, nx, endpoint=False)
    Y0 = (1.0 + 0.3 * np.sin(2 * np.pi * xg)[None, None, :]
          * np.ones((B, ny, 1))).astype(np.float32)
    params = np.linspace(0.5, 4.0, B).astype(np.float32)[:, None]

    kw = dict(rho=rho, rtol=1e-4, atol=1e-7, interpret=True)
    ref = solve_fused(heat, (0.0, 0.3), Y0, method=SSV2stab,
                      params=params, ensemble=True, **kw)
    out = solve_fused_sharded(heat, (0.0, 0.3), Y0, _mesh(),
                              method=SSV2stab, params=params, **kw)
    assert len(out) == len(ref)
    # integer outputs (status, counters — the per-member step
    # SEQUENCES) are exact; the grid itself differs only by XLA
    # reassociation rounding between the B=8 and B-per-device
    # compiled programs (interpret mode lowers through XLA fusion)
    for a, b in zip(out, ref):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "i":
            assert np.array_equal(a, b)
        else:
            assert np.allclose(a, b, rtol=0.0, atol=1e-4)
    assert np.all(np.asarray(out[1]) == 1)
    # per-member adaptivity is genuinely independent across shards
    assert len(set(int(x) for x in np.asarray(out[2]))) > 1


def test_fused_sharded_rejects_indivisible():
    Y0 = np.zeros((10, 2), np.float32)
    with pytest.raises(ValueError, match="divide"):
        solve_fused_sharded(vdp, (0.0, 1.0), Y0, _mesh(),
                            method=BS5, interpret=True)
