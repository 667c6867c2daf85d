#!/usr/bin/env python3
"""Round-5 directive #3: settle the Farneback updateMatrices floor with
committed evidence (the hs_ls_limiter.json treatment).

PARITY.md claims the um tent contraction is slice-op-bound at ~1 T
elem-ops/s; this script proves or refutes that with four measurements on
the dense um kernel's structure at 512^2, R=5 (121 shifts):

  1. band sweep (8/16/32/64): flat => not grid/DMA-overhead-bound;
  2. contraction-only microkernel (same loops, no M assembly): its time vs
     the full kernel prices the assembly tail;
  3. aligned-slices microkernel (identical op count, but every sublane
     slice at offset 0 — WRONG math, correct cost model): the gap to #2
     prices sublane-slice misalignment;
  4. no-slices microkernel (reuses one (5, band, cp) block per term):
     the residual is the pure FMA chain.

From (2)-(4): elem-ops/s for each op mix, giving the floor any
tent-contraction sampler pays.  Run ON THE TPU:

    PALLAS_AXON_REMOTE_COMPILE=1 timeout 5400 python3 scripts/fb_limiter.py

Writes scripts/fb_limiter.json incrementally.
"""

import json
import os
import signal
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fb_limiter.json")
RESULTS = {}


def emit(stage, **kw):
    RESULTS[stage] = kw
    print(json.dumps({"stage": stage, **kw}), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    def on_alarm(signum, frame):
        emit("watchdog", error="device unresponsive / compile overran")
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.expanduser("~/.cache/ofri_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    signal.alarm(3600)
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    emit("probe", device=str(jax.devices()[0]))

    from opticalflow_ri_tpu.ops.pallas.tent_sample import update_matrices_pallas
    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

    side = 512
    R = 5
    nshift = 2 * R + 1
    rows = cols = side

    rng = np.random.default_rng(0)
    s1, s2, ut, vt = particle_image_pair(shape=(side, side), seed=0)
    from opticalflow_ri_tpu.models.farneback import poly_expansion

    r0 = jax.block_until_ready(poly_expansion(jnp.asarray(s1, jnp.float32), 7, 1.5))
    r1 = jax.block_until_ready(poly_expansion(jnp.asarray(s2, jnp.float32), 7, 1.5))
    fx = jnp.asarray(ut, jnp.float32)
    fy = jnp.asarray(vt, jnp.float32)

    def force(*xs):
        return sum(float(jnp.sum(x)) for x in xs)

    def marginal(fn, args, chain=16, repeats=5):
        out = fn(*args)
        force(*(out if isinstance(out, tuple) else (out,)))

        def run_k(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*args)
            o = out if isinstance(out, tuple) else (out,)
            force(*o)
            return time.perf_counter() - t0

        tk = float(min(run_k(chain) for _ in range(repeats)))
        t2k = float(min(run_k(2 * chain) for _ in range(repeats)))
        m = (t2k - tk) / chain
        amortized = t2k / (2 * chain)
        if m <= 0.05 * amortized:
            return amortized
        return m

    # ---- 1. band sweep of the shipping dense kernel ------------------------
    for band in (8, 16, 32, 64):
        signal.alarm(2400)
        fn = lambda a, b: update_matrices_pallas(a, b, r0, r1, R, band=band)
        fn(fx, fy)
        signal.alarm(900)
        m = marginal(fn, (fx, fy))
        emit(f"um_band{band}", per_call_ms=m * 1e3)

    # ---- 2-4. structure microkernels --------------------------------------
    # Identical data movement and loop structure to _update_matrices_kernel's
    # contraction; `variant` changes ONLY the indexing/op mix being priced.
    def _micro_kernel(r1p_ref, fx_ref, fy_ref, s_out, *, band, cp, variant):
        i = pl.program_id(0)
        y0 = i * band
        flowx = fx_ref[:]
        flowy = fy_ref[:]
        dxc = jnp.clip(flowx, float(-R), R - 1e-3)
        dyc = jnp.clip(flowy, float(-R), R - 1e-3)

        win = r1p_ref[:, pl.ds(y0, band + nshift - 1), :]
        wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dyc - (sy - R)))
               for sy in range(nshift)]
        s = jnp.zeros((5, band, cp), jnp.float32)
        for sx in range(nshift):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxc - (sx - R)))
            cols_s = win[:, :, sx : sx + cp]
            fixed = cols_s[:, 0:band, :]
            t = jnp.zeros((5, band, cp), jnp.float32)
            for sy in range(nshift):
                if variant == "full":
                    blk = cols_s[:, sy : sy + band, :]
                elif variant == "aligned":
                    a0 = (sy // 8) * 8  # 8-aligned sublane offsets only
                    blk = cols_s[:, a0 : a0 + band, :]
                else:  # "noslice"
                    blk = fixed
                t = t + wys[sy][None] * blk
            s = s + wx[None] * t
        s_out[:] = s

    def micro(variant, band=32):
        ph = (-rows) % 8
        pw = (-cols) % 128
        rp, cp = rows + ph, cols + pw
        r1p = jnp.pad(r1, ((0, 0), (R, R + 1), (R, R + 1)), mode="edge")
        r1p = jnp.pad(r1p, ((0, 0), (0, ph), (0, pw)))
        fxp = jnp.pad(fx, ((0, ph), (0, pw)))
        fyp = jnp.pad(fy, ((0, ph), (0, pw)))
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        band2 = pl.BlockSpec((band, cp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        band5 = pl.BlockSpec((5, band, cp), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            partial(_micro_kernel, band=band, cp=cp, variant=variant),
            out_shape=jax.ShapeDtypeStruct((5, rp, cp), jnp.float32),
            grid=(rp // band,),
            in_specs=[vmem, band2, band2],
            out_specs=band5,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        return jax.jit(lambda a, b: f(r1p, a, b))

    for variant in ("full", "aligned", "noslice"):
        signal.alarm(2400)
        fn = micro(variant)
        fn(fx, fy)
        signal.alarm(900)
        m = marginal(fn, (fx, fy))
        # op model: per pixel per channel: nshift^2 FMA + nshift FMA (wx)
        # + weight evals; slices/rotates counted separately
        fma = 5 * rows * cols * (nshift * nshift + nshift)
        emit(f"micro_{variant}", per_call_ms=m * 1e3,
             fma_elem_ops=fma, achieved_T_elem_ops=fma / m / 1e12)

    signal.alarm(0)
    emit("done")


if __name__ == "__main__":
    main()
