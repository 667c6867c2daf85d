#!/usr/bin/env python3
"""Stage-level breakdown of dense LK at 512^2 on the TPU.

Times, with bench.py's chain-differenced marginal estimator:
  * full solve (impl=pallas / xla) at max_shift 6 and 5,
  * prep only (grads + structure tensor + C constants),
  * shift-plane build only (direct vs hierarchical window sums),
  * the band-resident Pallas GN loop on prebuilt planes.

Writes scripts/lk_breakdown.json.  Run on the TPU:
  timeout 900 python3 scripts/lk_breakdown.py
"""

import json
import os
import sys

if (
    os.environ.get("PALLAS_AXON_REMOTE_COMPILE") is None
    and "jax" not in sys.modules
):
    os.execve(sys.executable, [sys.executable] + sys.argv,
              dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from bench import load_pair, time_config
from opticalflow_ri_tpu.models.lucas_kanade import (
    lk_dense_solve, lk_build_planes, _GRID)
from opticalflow_ri_tpu.oracle.lucas_kanade import window_mask
from opticalflow_ri_tpu.ops.window_sums import runs_from_mask, wsum2d

HW = 13
WIN = 2 * HW + 1
RUNS = runs_from_mask(window_mask(WIN, 0, 0))


def prep(a, b, R):
    """Mirror of lk_dense_solve's pre-GN stages (same ops, same order)."""
    pad = HW + (_GRID - HW) + R + 1
    ipad = jnp.pad(a.astype(jnp.float32), pad, mode="edge")
    jpad = jnp.pad(b.astype(jnp.float32), pad, mode="edge")
    h, w = a.shape

    def grads(p):
        gx = 3.0 * (p[:-2, 2:] + p[2:, 2:] - p[:-2, :-2] - p[2:, :-2]) \
            + 10.0 * (p[1:-1, 2:] - p[1:-1, :-2])
        gy = 3.0 * (p[2:, :-2] + p[2:, 2:] - p[:-2, :-2] - p[:-2, 2:]) \
            + 10.0 * (p[2:, 1:-1] - p[:-2, 1:-1])
        return gx, gy

    gxp, gyp = grads(ipad)
    core_h, core_w = h + _GRID - 1, w + _GRID - 1
    o = pad - 1 - HW
    gx = lax.dynamic_slice(gxp, (o, o), (core_h, core_w))
    gy = lax.dynamic_slice(gyp, (o, o), (core_h, core_w))
    oi = pad - HW
    ic = lax.dynamic_slice(ipad, (oi, oi), (core_h, core_w))
    ws = lambda x: wsum2d(x, RUNS, RUNS, HW, h, w)
    a11, a12, a22 = ws(gx * gx), ws(gx * gy), ws(gy * gy)
    det = a11 * a22 - a12 * a12
    ok = det >= jnp.float32(1.192092896e-07)
    det_safe = jnp.where(ok, det, 1.0)
    c1, c2 = ws(ic * gx), ws(ic * gy)
    slab = lax.dynamic_slice(
        jpad, (oi - R, oi - R), (core_h + 2 * R, core_w + 2 * R))
    return (slab, jnp.stack([gx, gy]), a11 / det_safe, a12 / det_safe,
            a22 / det_safe, c1, c2, ok)


def main():
    d1, d2 = load_pair()
    d1 = jnp.asarray(d1, jnp.float32)
    d2 = jnp.asarray(d2, jnp.float32)
    h, w = d1.shape
    z = jnp.zeros((h, w), jnp.float32)
    dev = jax.devices()[0]
    print(f"# device {dev.device_kind}", file=sys.stderr)

    results = {}

    def record(name, fn, chain=8, repeats=3):
        lat, marg, amort, _, _, _ = time_config(
            fn, d1, d2, repeats=repeats, chain=chain)
        results[name] = {"latency_s": round(lat, 4),
                         "marginal_ms": round(marg * 1e3, 4),
                         "amortized_fallback": amort}
        print(json.dumps({name: results[name]}), flush=True)
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "lk_breakdown.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=1)

    for R in (6, 5):
        for impl in ("pallas", "xla"):
            f = jax.jit(lambda a, b, R=R, impl=impl: lk_dense_solve(
                a, b, z, z, half_window=HW, n_iter=5, asym=(0, 0, 0, 0),
                max_shift=R, impl=impl)[:2])
            record(f"full_R{R}_{impl}", f)

    prep6 = jax.jit(partial(prep, R=6))
    record("prep_only", lambda a, b: prep6(a, b)[5:7])

    for R in (6, 5):
        for hier in (False, True):
            @partial(jax.jit, static_argnames=())
            def build(a, b, R=R, hier=hier):
                slab, g_pair, *_ = prep(a, b, R)
                return lk_build_planes(
                    slab, g_pair, RUNS, RUNS, HW, h, w, R, hierarchical=hier)
            record(f"prep_build_R{R}_{'hier' if hier else 'direct'}", build)

    # GN-only on prebuilt planes
    from opticalflow_ri_tpu.ops.pallas.lk_iter import lk_gn_iterate_pallas
    for R in (6, 5):
        slab, g_pair, ia11, ia12, ia22, c1, c2, ok = prep6(d1, d2) \
            if R == 6 else jax.jit(partial(prep, R=5))(d1, d2)
        t1s, t2s = jax.jit(partial(
            lk_build_planes, runs_y=RUNS, runs_x=RUNS, hw=HW, h=h, w=w, R=R))(
            slab, g_pair)
        jj = lax.broadcasted_iota(jnp.float32, (h, w), 1)
        ii = lax.broadcasted_iota(jnp.float32, (h, w), 0)

        def gn(a, b, t1s=t1s, t2s=t2s, ia11=ia11, ia12=ia12, ia22=ia22,
               c1=c1, c2=c2, ok=ok, R=R):
            out = lk_gn_iterate_pallas(
                t1s, t2s, ia11, ia12, ia22, c1, c2, ok,
                jj - HW, ii - HW, 5, R, HW)
            return out[0], out[1]
        record(f"gn_pallas_R{R}", gn)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
