"""Mosaic compile-only smoke test for every fused Pallas kernel.

The pytest suite runs the fused kernels in interpret mode (the
conftest forces CPU), so a real-Mosaic lowering regression would
surface as a red benchmark rather than a red test.  This harness
closes that gap: it LOWERS AND COMPILES each kernel variant on the
attached TPU — `jit(...).lower(...).compile()` runs the full
XLA+Mosaic pipeline without executing — and reports PASS/FAIL per
kernel.  Exits nonzero on any failure — INCLUDING when no TPU is
attached (a gate that silently passes when it didn't run is no gate).
Writes the machine-checked artifact MOSAIC_SMOKE.json at the repo root
(per-kernel pass/fail + compile seconds + the git commit it ran at),
so "every kernel variant compiles under real Mosaic at HEAD" is a
committed fact rather than a claim.

Run (real TPU required): python validation/mosaic_smoke.py
"""
import json
import os
import subprocess
import sys
from time import perf_counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

FAILED = []
RESULTS = {}


def check(name, fn, *args):
    t0 = perf_counter()
    print(f"....  {name}", flush=True)       # visible BEFORE a hang
    try:
        jax.jit(fn).lower(*args).compile()
        dt = perf_counter() - t0
        print(f"PASS  {name}  ({dt:.1f}s)", flush=True)
        RESULTS[name] = {"pass": True, "compile_s": round(dt, 2)}
    except Exception as e:  # noqa: BLE001 — report and keep going
        print(f"FAIL  {name}: {type(e).__name__}: {e}", flush=True)
        FAILED.append(name)
        RESULTS[name] = {"pass": False,
                         "error": f"{type(e).__name__}: {e}"[:300]}


def write_artifact():
    root = os.path.join(os.path.dirname(__file__), "..")
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=root,
            capture_output=True, text=True).stdout.strip()
    except Exception:  # noqa: BLE001
        commit = "unknown"
    out = {"commit": commit,
           "backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "n_kernels": len(RESULTS),
           "failures": FAILED,
           "kernels": RESULTS}
    path = os.path.join(root, "MOSAIC_SMOKE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.abspath(path)}")


def main():
    if jax.default_backend() not in ("tpu", "axon"):
        print("FAIL: no TPU attached — the Mosaic smoke gate REQUIRES "
              "a real chip (exit 1 so this can never silently pass)")
        sys.exit(1)

    from extensisq_tpu.ops import (solve_fused_erk, solve_fused_rkn,
                                   solve_fused_rkc,
                                   solve_fused_rkc_ensemble,
                                   solve_fused_esdirk,
                                   solve_fused_adams,
                                   solve_fused_adams_grid,
                                   solve_fused_erk_grid,
                                   solve_fused_esdirk_grid,
                                   solve_fused_rkn_grid,
                                   solve_fused_ckdisc_grid)
    from extensisq_tpu.ops.fused_rkc import roll
    from extensisq_tpu import BS5, Fi5N, Kv3I, TRBDF2

    def vdp(t, y):
        return jnp.stack([y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0]])

    Y2 = np.zeros((256, 2), np.float32)
    tq = np.linspace(0.0, 2.0, 5).astype(np.float32)
    check("fused_erk", lambda Y: solve_fused_erk(
        vdp, (0.0, 2.0), Y, method=BS5, block_members=256), Y2)
    check("fused_erk compensated", lambda Y: solve_fused_erk(
        vdp, (0.0, 2.0), Y, method=BS5, block_members=256,
        compensated=True, rtol=1e-6, atol=1e-9), Y2)
    check("fused_erk t_eval", lambda Y: solve_fused_erk(
        vdp, (0.0, 2.0), Y, method=BS5, block_members=256,
        t_eval=tq), Y2)

    def ev_row(t, y):
        return y[0] - 1.0
    ev_row.terminal = True
    check("fused_erk events", lambda Y: solve_fused_erk(
        vdp, (0.0, 2.0), Y, method=BS5, block_members=256,
        events=ev_row), Y2)

    from extensisq_tpu.ops import solve_fused_ckdisc

    def swdec(t, y):
        sw = jnp.where(jnp.sin(3.0 * t) >= 0.0, 1.0, -1.0)
        return jnp.stack([(-sw - 0.5) * y[0], -y[1]])

    check("fused_ckdisc", lambda Y: solve_fused_ckdisc(
        swdec, (0.0, 5.0), Y, block_members=256), Y2 + 1.0)
    check("fused_ckdisc t_eval+events", lambda Y: solve_fused_ckdisc(
        swdec, (0.0, 5.0), Y, block_members=256, t_eval=tq,
        events=ev_row), Y2 + 1.0)

    def acc2(t, u, v):
        r2 = u[0] ** 2 + u[1] ** 2
        aa = -(r2 * jnp.sqrt(r2)) ** -1.0
        return jnp.stack([aa * u[0], aa * u[1]])

    Y4 = np.zeros((256, 4), np.float32)
    Y4[:, 0] = 1.0
    Y4[:, 3] = 1.0
    check("fused_rkn", lambda Y: solve_fused_rkn(
        acc2, (0.0, 3.0), Y, method=Fi5N, block_members=256), Y4)
    check("fused_rkn t_eval", lambda Y: solve_fused_rkn(
        acc2, (0.0, 3.0), Y, method=Fi5N, block_members=256,
        t_eval=tq), Y4)

    def ev_u0(t, y):
        return y[0] - 0.5
    ev_u0.terminal = True
    check("fused_rkn events", lambda Y: solve_fused_rkn(
        acc2, (0.0, 3.0), Y, method=Fi5N, block_members=256,
        events=ev_u0), Y4)
    check("fused_rkn dense recording", lambda Y: solve_fused_rkn(
        acc2, (0.0, 3.0), Y, method=Fi5N, block_members=256,
        dense=128)[-1].ts, Y4)

    ny, nx = 16, 128
    dx = 1.0 / nx

    def bru(t, uv):
        lap = (roll(uv, 1, 1) + roll(uv, -1, 1)
               + roll(uv, 1, 2) + roll(uv, -1, 2) - 4.0 * uv) / dx ** 2
        u, v = uv[0], uv[1]
        uv2 = u * u * v
        return jnp.stack([1.0 + uv2 - 4.0 * u + 0.02 * lap[0],
                          3.0 * u - uv2 + 0.02 * lap[1]])

    rho = 8.0 * 0.02 / dx ** 2 + 5.0
    G = np.ones((2, ny, nx), np.float32)
    check("fused_rkc", lambda Y: solve_fused_rkc(
        bru, (0.0, 1.0), Y, rho), G)
    check("fused_rkc t_eval", lambda Y: solve_fused_rkc(
        bru, (0.0, 1.0), Y, rho, t_eval=tq), G)

    check("fused_rkc power-rho", lambda Y: solve_fused_rkc(
        bru, (0.0, 1.0), Y, None), G)

    def ev_gmean(t, y):
        return jnp.mean(y[0]) - 1.5
    ev_gmean.terminal = True
    check("fused_rkc events", lambda Y: solve_fused_rkc(
        bru, (0.0, 1.0), Y, rho, events=ev_gmean), G)

    def bru_p(t, uv, p):
        return bru(t, uv) * 1.0 + 0.0 * p[0]

    GE = np.ones((8, 2, ny, nx), np.float32)
    PE = np.ones((8, 1), np.float32)
    check("fused_rkc ensemble", lambda Y, P: solve_fused_rkc_ensemble(
        bru_p, (0.0, 1.0), Y, rho, params=P), GE, PE)

    def ev_gmean_p(t, y, p):
        return jnp.mean(y[0]) - 1.5
    ev_gmean_p.terminal = True
    check("fused_rkc ensemble power/events/t_eval",
          lambda Y, P: solve_fused_rkc_ensemble(
              bru_p, (0.0, 1.0), Y, None, params=P, t_eval=tq,
              events=ev_gmean_p), GE, PE)

    def rob(t, y):
        r1 = -0.04 * y[0] + 1e4 * y[1] * y[2]
        r3 = 3e7 * y[1] * y[1]
        return jnp.stack([r1, -r1 - r3, r3])

    Y3 = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (256, 1))
    check("fused_esdirk", lambda Y: solve_fused_esdirk(
        rob, (0.0, 1e4), Y, method=Kv3I, block_members=256), Y3)
    check("fused_esdirk compensated", lambda Y: solve_fused_esdirk(
        rob, (0.0, 1e4), Y, method=Kv3I, block_members=256,
        compensated=True, rtol=1e-6, atol=1e-9), Y3)
    check("fused_esdirk t_eval", lambda Y: solve_fused_esdirk(
        rob, (0.0, 1e4), Y, method=Kv3I, block_members=256,
        t_eval=np.logspace(-2, 4, 7).astype(np.float32)), Y3)

    def ev_y2(t, y):
        return y[1] - 2e-5
    ev_y2.terminal = True
    check("fused_esdirk events", lambda Y: solve_fused_esdirk(
        rob, (0.0, 1e4), Y, method=Kv3I, block_members=256,
        events=ev_y2), Y3)

    # hidden-M DAE (SVD pre-rotation)
    rng = np.random.RandomState(1)
    A = rng.rand(2, 2)
    B = rng.rand(2, 2)
    Binv = np.linalg.inv(B)
    M_hidden = A @ np.array([[0.0, 0.0], [0.0, 1.0]]) @ Binv

    def kaps_rows(t, z):
        y0 = Binv[0, 0] * z[0] + Binv[0, 1] * z[1]
        y1 = Binv[1, 0] * z[0] + Binv[1, 1] * z[1]
        f0 = -y0 + y1 * y1
        f1 = y0 - y1 - y1 * y1
        return jnp.stack([A[0, 0] * f0 + A[0, 1] * f1,
                          A[1, 0] * f0 + A[1, 1] * f1])

    Z0 = np.tile((B @ [1.0, 1.0]).astype(np.float32), (256, 1))
    ZP0 = np.tile((B @ [-2.0, -1.0]).astype(np.float32), (256, 1))
    check("fused_esdirk hidden-M",
          lambda Z, ZP: solve_fused_esdirk(
              kaps_rows, (0.0, 1.0), Z, method=TRBDF2, M=M_hidden,
              yp0_batch=ZP, block_members=256), Z0, ZP0)

    def ev_hidden(t, z):
        return Binv[1, 0] * z[0] + Binv[1, 1] * z[1] - 0.8
    ev_hidden.terminal = True
    check("fused_esdirk hidden-M events",
          lambda Z, ZP: solve_fused_esdirk(
              kaps_rows, (0.0, 1.0), Z, method=TRBDF2, M=M_hidden,
              yp0_batch=ZP, block_members=256, events=ev_hidden),
          Z0, ZP0)

    check("fused_adams", lambda Y: solve_fused_adams(
        vdp, (0.0, 2.0), Y, block_members=256), Y2)
    check("fused_adams compensated", lambda Y: solve_fused_adams(
        vdp, (0.0, 2.0), Y, block_members=256, compensated=True,
        rtol=1e-6, atol=1e-9), Y2)
    check("fused_adams t_eval", lambda Y: solve_fused_adams(
        vdp, (0.0, 2.0), Y, block_members=256, t_eval=tq), Y2)
    check("fused_adams events", lambda Y: solve_fused_adams(
        vdp, (0.0, 2.0), Y, block_members=256, events=ev_row), Y2)
    check("fused_adams dense recording", lambda Y: solve_fused_adams(
        vdp, (0.0, 2.0), Y, block_members=256, dense=128)[-1].ts, Y2)

    # mid-size layout: states on lanes, members on sublanes
    ngr = 128
    dxg = 1.0 / ngr

    def heat_g(t, y):
        return 0.01 * (jnp.roll(y, 1, -1) + jnp.roll(y, -1, -1)
                       - 2.0 * y) / dxg ** 2

    YG = np.tile(np.sin(2 * np.pi * np.linspace(0, 1, ngr,
                                                endpoint=False))
                 .astype(np.float32), (32, 1))
    check("fused_adams_grid", lambda Y: solve_fused_adams_grid(
        heat_g, (0.0, 0.2), Y, k_max=6, block_members=32), YG)
    check("fused_adams_grid t_eval", lambda Y: solve_fused_adams_grid(
        heat_g, (0.0, 0.2), Y, k_max=6, block_members=32,
        t_eval=np.linspace(0.0, 0.2, 4).astype(np.float32)), YG)

    def ev_lane32(t, y):
        return y[:, 32:33] - 0.5
    ev_lane32.terminal = True
    check("fused_adams_grid events",
          lambda Y: solve_fused_adams_grid(
              heat_g, (0.0, 0.2), Y, k_max=6, block_members=32,
              events=ev_lane32), YG)

    def fisher_g(t, y):
        return (-1.0 * (y - jnp.roll(y, 1, -1)) * ngr
                + y * (1.0 - y))

    check("fused_erk_grid", lambda Y: solve_fused_erk_grid(
        fisher_g, (0.0, 0.5), Y, block_members=32), YG)
    check("fused_erk_grid compensated", lambda Y: solve_fused_erk_grid(
        fisher_g, (0.0, 0.5), Y, block_members=32, rtol=1e-6,
        atol=1e-9, compensated=True), YG)
    check("fused_erk_grid t_eval", lambda Y: solve_fused_erk_grid(
        fisher_g, (0.0, 0.5), Y, block_members=32,
        t_eval=np.linspace(0.0, 0.5, 4).astype(np.float32)), YG)

    def ev_lane(t, y):
        return y[:, 0:1] - 0.95
    ev_lane.terminal = True
    check("fused_erk_grid events", lambda Y: solve_fused_erk_grid(
        fisher_g, (0.0, 0.5), Y, block_members=32,
        events=ev_lane), YG)

    def rdiff_g(t, y):
        return (0.01 * (jnp.roll(y, 1, -1) + jnp.roll(y, -1, -1)
                        - 2.0 * y) * ngr * ngr + y * y * (1.0 - y))

    YG8 = YG[:8]
    check("fused_esdirk_grid", lambda Y: solve_fused_esdirk_grid(
        rdiff_g, (0.0, 0.1), Y, block_members=8), YG8)
    check("fused_esdirk_grid compensated",
          lambda Y: solve_fused_esdirk_grid(
              rdiff_g, (0.0, 0.1), Y, block_members=8, rtol=1e-6,
              atol=1e-9, compensated=True), YG8)
    check("fused_esdirk_grid t_eval",
          lambda Y: solve_fused_esdirk_grid(
              rdiff_g, (0.0, 0.1), Y, block_members=8,
              t_eval=np.linspace(0.0, 0.1, 4).astype(np.float32)),
          YG8)

    def wave_g(t, u, v):
        return 400.0 * (jnp.roll(u, 1, -1) + jnp.roll(u, -1, -1)
                        - 2.0 * u)

    YW = np.concatenate([YG8, np.zeros_like(YG8)], axis=1)
    check("fused_rkn_grid", lambda Y: solve_fused_rkn_grid(
        wave_g, (0.0, 1.0), Y, block_members=8), YW)
    check("fused_rkn_grid t_eval", lambda Y: solve_fused_rkn_grid(
        wave_g, (0.0, 1.0), Y, block_members=8,
        t_eval=np.linspace(0.0, 1.0, 4).astype(np.float32)), YW)
    check("fused_rkn_grid compensated", lambda Y: solve_fused_rkn_grid(
        wave_g, (0.0, 1.0), Y, block_members=8, rtol=1e-6,
        atol=1e-9, compensated=True), YW)

    def ev_umean(t, y):
        return jnp.mean(y[:, :128], axis=-1, keepdims=True) - 0.1
    ev_umean.terminal = True
    check("fused_rkn_grid events", lambda Y: solve_fused_rkn_grid(
        wave_g, (0.0, 1.0), Y, block_members=8, events=ev_umean), YW)

    # diagonal mass WITHOUT yp0: exercises the in-kernel M^-1 f0
    # initial-derivative paths (both layouts)
    check("fused_esdirk diag-M no-yp0", lambda Y: solve_fused_esdirk(
        rob, (0.0, 1e3), Y, method=Kv3I, block_members=256,
        M=np.array([2.0, 1.0, 3.0])), Y3)
    check("fused_esdirk_grid diag-M no-yp0",
          lambda Y: solve_fused_esdirk_grid(
              rdiff_g, (0.0, 0.1), Y, block_members=8,
              M=2.0 * np.ones(128)), YG8)

    def ev_mean(t, y):
        return jnp.mean(y, axis=-1, keepdims=True) - 0.9
    ev_mean.terminal = True
    check("fused_esdirk_grid events",
          lambda Y: solve_fused_esdirk_grid(
              rdiff_g, (0.0, 0.1), Y, block_members=8,
              events=ev_mean), YG8)

    # per-member params (the parameter-sweep ensemble axis): the RHS
    # and event callables gain a third argument p (k-tuple of member
    # tiles) on every kernel/layout
    P2 = np.linspace(1.0, 5.0, 256).astype(np.float32)[:, None]

    def vdp_p(t, y, p):
        return jnp.stack([y[1], p[0] * (1 - y[0] ** 2) * y[1] - y[0]])

    def ev_row_p(t, y, p):
        return y[0] - 1.0
    ev_row_p.terminal = True
    check("fused_erk params+events", lambda Y, P: solve_fused_erk(
        vdp_p, (0.0, 2.0), Y, method=BS5, block_members=256,
        params=P, events=ev_row_p), Y2, P2)

    def acc2_p(t, u, v, p):
        return acc2(t, u, v) * p[0]
    check("fused_rkn params", lambda Y, P: solve_fused_rkn(
        acc2_p, (0.0, 3.0), Y, method=Fi5N, block_members=256,
        params=P), Y4, P2)

    def swdec_p(t, y, p):
        return swdec(t, y) * p[0]
    check("fused_ckdisc params", lambda Y, P: solve_fused_ckdisc(
        swdec_p, (0.0, 5.0), Y, block_members=256, params=P),
        Y2 + 1.0, P2)

    def rob_p(t, y, p):
        r1 = -0.04 * y[0] + p[0] * 1e4 * y[1] * y[2]
        r3 = 3e7 * y[1] * y[1]
        return jnp.stack([r1, -r1 - r3, r3])
    check("fused_esdirk params", lambda Y, P: solve_fused_esdirk(
        rob_p, (0.0, 1e3), Y, method=Kv3I, block_members=256,
        params=P), Y3, P2)

    def vdp_dec_p(t, y, p):
        return jnp.stack([-p[0] * y[0], -y[1]])
    check("fused_adams params", lambda Y, P: solve_fused_adams(
        vdp_dec_p, (0.0, 2.0), Y, block_members=256, params=P),
        Y2 + 1.0, P2)

    PG = np.linspace(0.5, 2.0, 32).astype(np.float32)[:, None]

    def heat_gp(t, y, p):
        return p[0] * heat_g(t, y)
    check("fused_adams_grid params",
          lambda Y, P: solve_fused_adams_grid(
              heat_gp, (0.0, 0.2), Y, k_max=6, block_members=32,
              params=P), YG, PG)

    def fisher_gp(t, y, p):
        return p[0] * fisher_g(t, y)
    check("fused_erk_grid params", lambda Y, P: solve_fused_erk_grid(
        fisher_gp, (0.0, 0.5), Y, block_members=32, params=P),
        YG, PG)

    def rdiff_gp(t, y, p):
        return p[0] * rdiff_g(t, y)
    check("fused_esdirk_grid params",
          lambda Y, P: solve_fused_esdirk_grid(
              rdiff_gp, (0.0, 0.1), Y, block_members=8, params=P),
          YG8, PG[:8])

    def wave_gp(t, u, v, p):
        return p[0] * wave_g(t, u, v)
    check("fused_rkn_grid params", lambda Y, P: solve_fused_rkn_grid(
        wave_gp, (0.0, 1.0), Y, block_members=8, params=P),
        YW, PG[:8])

    # mid-size non-smooth: the grid-layout CKdisc cascade
    def fisher_sw(t, y):
        sw = jnp.where(jnp.sin(4.0 * t) >= 0.0, 1.0, -1.0)
        return fisher_g(t, y) + 0.3 * sw

    check("fused_ckdisc_grid", lambda Y: solve_fused_ckdisc_grid(
        fisher_sw, (0.0, 0.5), Y, block_members=32), YG)
    check("fused_ckdisc_grid t_eval+events",
          lambda Y: solve_fused_ckdisc_grid(
              fisher_sw, (0.0, 0.5), Y, block_members=32,
              t_eval=np.linspace(0.0, 0.5, 3).astype(np.float32),
              events=ev_lane), YG)

    def fisher_swp(t, y, p):
        return p[0] * fisher_sw(t, y)
    check("fused_ckdisc_grid params",
          lambda Y, P: solve_fused_ckdisc_grid(
              fisher_swp, (0.0, 0.5), Y, block_members=32, params=P),
          YG, PG)

    # masked lane padding (ops/_lane_pad.py): arbitrary n = 200 rides
    # every grid kernel (pads to 256; ESDIRK power-of-two 256).  The
    # unaligned in-kernel slices/concats are the Mosaic-risk surface —
    # interpret-mode tests cannot prove these lower.
    npd = 200

    def fisher_p200(t, y):
        left = jnp.concatenate([jnp.zeros_like(y[:, :1]), y[:, :-1]],
                               axis=1)
        return -npd * 1.0 * (y - left) + y * (1.0 - y)

    YP = np.tile(np.exp(-30 * (np.linspace(0, 1, npd) - 0.3) ** 2)
                 .astype(np.float32), (32, 1))
    check("fused_erk_grid padded n=200",
          lambda Y: solve_fused_erk_grid(
              fisher_p200, (0.0, 0.5), Y, block_members=32), YP)
    check("fused_erk_grid padded t_eval+events",
          lambda Y: solve_fused_erk_grid(
              fisher_p200, (0.0, 0.5), Y, block_members=32,
              t_eval=np.linspace(0.0, 0.5, 3).astype(np.float32),
              events=ev_lane), YP)
    check("fused_adams_grid padded n=200",
          lambda Y: solve_fused_adams_grid(
              fisher_p200, (0.0, 0.5), Y, k_max=6,
              block_members=32), YP)
    check("fused_ckdisc_grid padded n=200",
          lambda Y: solve_fused_ckdisc_grid(
              fisher_p200, (0.0, 0.5), Y, block_members=32), YP)

    def rdiff_p200(t, y):
        left = jnp.concatenate([jnp.zeros_like(y[:, :1]), y[:, :-1]],
                               axis=1)
        right = jnp.concatenate([y[:, 1:], jnp.zeros_like(y[:, :1])],
                                axis=1)
        return (40.0 * (left - 2.0 * y + right)
                + y * (1.0 - y) * (y - 0.3))

    check("fused_esdirk_grid padded n=200",
          lambda Y: solve_fused_esdirk_grid(
              rdiff_p200, (0.0, 0.2), Y, block_members=8), YP[:8])

    def wave_p200(t, u, v):
        left = jnp.concatenate([jnp.zeros_like(u[:, :1]), u[:, :-1]],
                               axis=1)
        right = jnp.concatenate([u[:, 1:], jnp.zeros_like(u[:, :1])],
                                axis=1)
        return 400.0 * (left - 2.0 * u + right)

    YWP = np.concatenate([YP[:8], np.zeros_like(YP[:8])], axis=1)
    check("fused_rkn_grid padded n=200",
          lambda Y: solve_fused_rkn_grid(
              wave_p200, (0.0, 0.5), Y, block_members=8), YWP)

    # fused forward sensitivities: variational rows from in-kernel
    # jax.jvp of the user RHS (augmented state n*(1+k+n) = 8)
    from extensisq_tpu.ops import solve_fused_sens, solve_fused_final

    def vdp_p(t, y, p):
        return jnp.stack([y[1], p[0] * (1 - y[0] ** 2) * y[1] - y[0]])

    Y0s = np.zeros((256, 2), np.float32)
    Y0s[:, 0] = 2.0
    Ps = np.linspace(1.0, 2.0, 256).astype(np.float32)[:, None]
    check("fused_sens (S_p + S_y0)", lambda Y, P: solve_fused_sens(
        vdp_p, (0.0, 3.0), Y, params=P, sens_y0=True,
        block_members=256)[:3], Y0s, Ps)
    check("fused_final grad", lambda Y, P: jax.grad(
        lambda YY, PP: jnp.sum(solve_fused_final(
            vdp_p, (0.0, 3.0), YY, PP, None, 1e-4, 1e-6, 100_000,
            256, False, False)[:, 0]), argnums=(0, 1))(Y, P),
        Y0s, Ps)

    # STIFF fused sensitivities: the simultaneous-corrector ESDIRK
    # route (block_base) — blockwise Newton solves + in-kernel JVPs
    # over the augmented state
    def rob_p(t, y, p):
        r1 = p[0] * y[0]
        r2 = 1e4 * y[1] * y[2]
        r3 = 3e7 * y[1] * y[1]
        return jnp.stack([-r1 + r2, r1 - r2 - r3, r3])

    from extensisq_tpu.methods import TRBDF2
    Y0r = np.tile([1.0, 0.0, 0.0], (256, 1)).astype(np.float32)
    Pr = np.full((256, 1), 0.04, np.float32)
    check("fused_sens esdirk (Robertson)",
          lambda Y, P: solve_fused_sens(
              rob_p, (0.0, 0.4), Y, params=P, method=TRBDF2,
              rtol=1e-4, atol=1e-8, block_members=256)[:2], Y0r, Pr)

    # dense-output recording: dynamic-index VMEM stores at the scalar
    # loop counter from INSIDE the while loop — the Mosaic risk
    # surface interpret mode cannot prove
    check("fused_erk dense recording",
          lambda Y: solve_fused_erk(
              vdp_p, (0.0, 3.0), Y, params=Ps, rtol=1e-4, atol=1e-6,
              block_members=256, dense=128)[4].ts, Y0s)
    check("fused_esdirk dense recording",
          lambda Y, P: solve_fused_esdirk(
              rob_p, (0.0, 0.4), Y, params=P, method=TRBDF2,
              rtol=1e-4, atol=1e-8, block_members=256,
              dense=128)[4].ts, Y0r, Pr)

    # GRID-layout fused sensitivities: the augmented [y | s_j] blocks
    # on the lane axis — ERK, and the ESDIRK simultaneous corrector
    # (block_base: tiled base bands + block-cyclic PCR d-rolls)
    def fisher_gp(t, y, p):
        return (-1.0 * (y - jnp.roll(y, 1, -1)) * ngr
                + p[0] * y * (1.0 - y))

    PG = np.linspace(0.8, 1.2, 32).astype(np.float32)[:, None]
    check("fused_sens grid (ERK)", lambda Y, P: solve_fused_sens(
        fisher_gp, (0.0, 0.5), Y, params=P, rtol=1e-4, atol=1e-6,
        block_members=32, layout="grid")[:2], YG, PG)

    def rd_gp(t, y, p):
        left = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
        right = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
        return (left - 2.0 * y + right) * p[1] - p[0] * (y - 1.0)

    PG8 = np.stack([np.linspace(5.0, 30.0, 8),
                    np.full(8, 200.0)], axis=1).astype(np.float32)
    check("fused_sens grid esdirk (block_base PCR)",
          lambda Y, P: solve_fused_sens(
              rd_gp, (0.0, 0.04), Y, params=P, method=TRBDF2,
              rtol=1e-5, atol=1e-8, block_members=8,
              layout="grid")[:2], YG8, PG8)
    # per-block lane padding: n = 96 pads each [y | s_j] block to 128
    check("fused_sens grid esdirk padded blocks (n=96)",
          lambda Y, P: solve_fused_sens(
              rd_gp, (0.0, 0.04), Y, params=P, method=TRBDF2,
              rtol=1e-5, atol=1e-8, block_members=8,
              layout="grid")[:2], np.ascontiguousarray(YG8[:, :96]),
          PG8)

    # GRID-layout dense recording: (R, bm, n) buffers, dynamic-index
    # VMEM stores at the loop counter (the flat kernels' risk surface
    # in the states-on-lanes layout)
    check("fused_erk_grid dense recording",
          lambda Y: solve_fused_erk_grid(
              fisher_g, (0.0, 0.5), Y, block_members=8,
              dense=128)[-1].ts, YG8)
    check("fused_esdirk_grid dense recording",
          lambda Y: solve_fused_esdirk_grid(
              rdiff_g, (0.0, 0.1), Y, block_members=8,
              dense=128)[-1].ts, YG8)
    # complex ensembles: blocked [Re | Im] real-pair encoding on the
    # unchanged real ERK kernels (both layouts; grid exercises the
    # joint-2n lane padding).  The complex arrays close over as HOST
    # numpy (split_output=True keeps the jitted program all-real —
    # the axon backend cannot hold complex buffers at all)
    from extensisq_tpu.ops import solve_fused_erk_complex, cmul

    Zs = (np.random.RandomState(3).randn(256, 2)
          + 1j * np.random.RandomState(4).randn(256, 2)
          ).astype(np.complex64)
    check("fused_erk complex flat",
          lambda: solve_fused_erk_complex(
              lambda t, re, im: (-im - 0.1 * re, re - 0.1 * im),
              (0.0, 1.0), Zs, layout="flat", block_members=256,
              split_output=True)[0])
    Zg = (np.random.RandomState(5).randn(8, 24)
          + 1j * np.random.RandomState(6).randn(8, 24)
          ).astype(np.complex64)
    Wg = np.linspace(1.0, 3.0, 8).astype(np.float32)[:, None]
    check("fused_erk complex grid padded+params",
          lambda W: solve_fused_erk_complex(
              lambda t, re, im, p: cmul(re, im, 0.0 * re - 0.3,
                                        p[0] + 0.0 * re),
              (0.0, 1.0), Zg, layout="grid", params=W,
              block_members=8, split_output=True)[0], Wg)

    check("fused_rkn_grid dense recording",
          lambda Y: solve_fused_rkn_grid(
              wave_g, (0.0, 1.0), Y, block_members=8,
              dense=128)[-1].ts, YW)
    check("fused_adams_grid dense recording",
          lambda Y: solve_fused_adams_grid(
              heat_g, (0.0, 0.2), Y, k_max=6, block_members=32,
              dense=128)[-1].ts, YG)

    write_artifact()
    if FAILED:
        print("\nFAIL:", ", ".join(FAILED))
        sys.exit(1)
    print("\nPASS — all fused kernels lower and compile under Mosaic")


if __name__ == "__main__":
    main()
