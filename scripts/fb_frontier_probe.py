#!/usr/bin/env python3
"""Round-4 FB frontier diagnostics on the TPU.

1. 2048^2: what does the XLA blur5+updateFlow cost per iteration next to the
   channel-blocked um?  (Sizes the prize of a channel-banded blur kernel.)
2. Compile-time bisection of the fused-loop kernel pathology: a reduced
   kernel with ONLY the blur+solve loop body (no um contraction) — if it
   compiles fast, the um unroll inside lax.fori_loop is the pathology; if it
   hangs too, the per-column border stores are.

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 3600 python3 scripts/fb_frontier_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fb_frontier_probe.json")
RESULTS = {}


def emit(stage, **kw):
    RESULTS[stage] = kw
    print(json.dumps({"stage": stage, **kw}), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    import signal

    def on_alarm(signum, frame):
        emit("watchdog", error="compile overran its box")
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(3600)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/ofri_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    emit("probe", device=str(jax.devices()[0]))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_pallas import marginal

    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair
    from opticalflow_ri_tpu.models.farneback import (
        poly_expansion, update_matrices_dispatch, _blur_flow_dispatch,
    )

    # ---- 1: 2048^2 per-stage costs --------------------------------------
    side = 2048
    s1, s2, _, _ = particle_image_pair(shape=(side, side), seed=0)
    s1 = jnp.asarray(s1, jnp.float32)
    s2 = jnp.asarray(s2, jnp.float32)
    z = jnp.zeros((side, side), jnp.float32)

    signal.alarm(1800)
    r0 = jax.block_until_ready(poly_expansion(s1, 7, 1.5))
    r1 = jax.block_until_ready(poly_expansion(s2, 7, 1.5))

    poly1 = jax.jit(lambda a: poly_expansion(a, 7, 1.5))
    m_poly, _ = marginal(poly1, (s1,), chain=4, repeats=3)
    emit("poly_2048", marginal_ms=m_poly * 1e3)

    um_c = jax.jit(lambda fx, fy: update_matrices_dispatch(
        fx, fy, r0, r1, impl="pallas_channel"))
    m_um, _ = marginal(um_c, (z, z), chain=4, repeats=3)
    emit("um_channel_once_2048", marginal_ms=m_um * 1e3)

    m0 = jax.block_until_ready(um_c(z, z))
    bf_x = jax.jit(lambda mm: _blur_flow_dispatch(mm, 33, True, impl="xla"))
    m_bf, _ = marginal(bf_x, (m0,), chain=4, repeats=3)
    emit("blur_flow_xla_once_2048", marginal_ms=m_bf * 1e3)

    # ---- 2: fused-kernel compile bisection at 512^2 ----------------------
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    rows = cols = 512
    half = 16
    taps = tuple(float(x) for x in range(1, 34))  # arbitrary 33 taps

    def blur_only_kernel(m_ref, fx_out, fy_out, a_scr, b_scr, *, n_iters):
        def body(_, carry):
            fxc, fyc = carry
            m = m_ref[:] + fxc[None] * 0.0  # keep carry live
            a_scr[:, half : half + rows, :] = m
            for r in range(half):
                a_scr[:, half - 1 - r, :] = m[:, r + 1, :]
                a_scr[:, half + rows + r, :] = m[:, rows - 2 - r, :]
            a = a_scr[:]
            tmp = None
            for j, wgt in enumerate(taps):
                t = a[:, j : j + rows, :] * jnp.float32(wgt)
                tmp = t if tmp is None else tmp + t
            b_scr[:, :, half : half + cols] = tmp
            for c in range(half):
                b_scr[:, :, half - 1 - c] = tmp[:, :, c + 1]
                b_scr[:, :, half + cols + c] = tmp[:, :, cols - 2 - c]
            b = b_scr[:]
            blur = None
            for j, wgt in enumerate(taps):
                t = b[:, :, j : j + cols] * jnp.float32(wgt)
                blur = t if blur is None else blur + t
            g11, g12, g22, h1, h2 = blur[0], blur[1], blur[2], blur[3], blur[4]
            det_inv = 1.0 / (g11 * g22 - g12 * g12 + jnp.float32(1e-3))
            return ((g11 * h2 - g12 * h1) * det_inv,
                    (g22 * h1 - g12 * h2) * det_inv)

        fx, fy = lax.fori_loop(0, n_iters, body, (fx_out[:], fy_out[:]))
        fx_out[:] = fx
        fy_out[:] = fy

    m5 = jnp.zeros((5, rows, cols), jnp.float32)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        partial(blur_only_kernel, n_iters=5),
        out_shape=(jax.ShapeDtypeStruct((rows, cols), jnp.float32),) * 2,
        in_specs=[vmem],
        out_specs=(vmem, vmem),
        scratch_shapes=[
            pltpu.VMEM((5, rows + 2 * half, cols), jnp.float32),
            pltpu.VMEM((5, rows, cols + 2 * half), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    signal.alarm(900)  # 15-min box: past that the answer is "borders"
    t0 = time.perf_counter()
    try:
        out = jax.block_until_ready(jax.jit(fn)(m5))
        emit("blur_only_compile", seconds=round(time.perf_counter() - t0, 1),
             ok=True)
    except Exception as e:
        emit("blur_only_compile", seconds=round(time.perf_counter() - t0, 1),
             error=repr(e)[:300])

    signal.alarm(0)
    emit("done")


if __name__ == "__main__":
    main()
