#!/usr/bin/env python3
"""Round-5 directive #5: explain (or fix) the HS scan-stream penalty.

Round-4 bench: scan_pipeline("PyHSchunck_Fs3_4") streamed at 3.03 ms/pair
while the same config's pipelined (repeat-dispatch) marginal was 2.43 ms —
a 25% penalty on the production streaming construct, HS-specific (LK and FB
stream FASTER than their marginals).  This probe isolates the cause:

  * pipelined marginal vs scan amortized per-pair, K=4 and K=16 (separates
    fixed dispatch overhead from true per-pair cost via the K-scaling);
  * the same pair of measurements with the solver forced to XLA (does the
    penalty exist without the whole-solve Pallas kernel?);
  * the same with the solver forced to the temporal-blocked tiled kernel
    (is it hs_whole-specific?);
  * optionally (--trace) an xprof trace of the steady-state scan.

Run ON THE TPU:
    PALLAS_AXON_REMOTE_COMPILE=1 timeout 3600 python3 scripts/hs_scan_probe.py

Writes scripts/hs_scan_probe.json incrementally.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "hs_scan_probe.json")
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

    cache = os.path.expanduser("~/.cache/ofri_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    signal.alarm(3600)
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    emit("probe", device=str(jax.devices()[0]))

    from opticalflow_ri_tpu.utils.io import load_image

    p = "/root/reference/examples/testImages/Bits08/Ni06/parabolic01_%d.tif"
    im1 = jnp.asarray(load_image(p % 0), jnp.float32)
    im2 = jnp.asarray(load_image(p % 1), jnp.float32)

    from opticalflow_ri_tpu.compile import pipeline_fn

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

    def scan_time(fn, stacks, repeats=5):
        """Amortized per-pair time of one scan dispatch over a K-stack."""
        k = stacks[0].shape[0]
        u, v = fn(*stacks)
        force(u)

        def once():
            t0 = time.perf_counter()
            u, v = fn(*stacks)
            force(u)
            return time.perf_counter() - t0

        return float(min(once() for _ in range(repeats))) / k

    name = "PyHSchunck_Fs3_4"

    def build_variant(variant):
        """(dispatch_fn, scanned_fn) with the solver dispatch pinned."""
        import opticalflow_ri_tpu.models.horn_schunck as hs_mod
        from opticalflow_ri_tpu.ops.pallas import force_xla

        fn = pipeline_fn(name)

        orig = hs_mod._pick_impl
        if variant == "tiled":
            hs_mod._pick_impl = lambda shape: "pallas_tiled"
        try:
            if variant == "xla":
                with force_xla():
                    disp = jax.jit(fn).lower(im1, im2).compile()
            else:
                disp = jax.jit(fn).lower(im1, im2).compile()

            def scanned(im1s, im2s):
                def step(carry, pair):
                    u, v = fn(pair[0], pair[1])
                    return carry, (u, v)

                _, (us, vs) = jax.lax.scan(step, None, (im1s, im2s))
                return us, vs

            k16 = (jnp.stack([im1] * 16), jnp.stack([im2] * 16))
            k4 = (jnp.stack([im1] * 4), jnp.stack([im2] * 4))
            if variant == "xla":
                with force_xla():
                    sc = jax.jit(scanned).lower(*k16).compile()
                    sc4 = jax.jit(scanned).lower(*k4).compile()
            else:
                sc = jax.jit(scanned).lower(*k16).compile()
                sc4 = jax.jit(scanned).lower(*k4).compile()
        finally:
            hs_mod._pick_impl = orig
        return disp, sc, sc4, k16, k4

    for variant in ("default", "xla", "tiled"):
        signal.alarm(2400)
        disp, sc, sc4, k16, k4 = build_variant(variant)
        signal.alarm(900)
        m = marginal(disp, (im1, im2))
        t16 = scan_time(sc, k16)
        t4 = scan_time(sc4, k4)
        # per-pair slope between K=4 and K=16 cancels the fixed overhead
        slope = (t16 * 16 - t4 * 4) / 12.0
        emit(f"scan_{variant}", pipelined_marginal_ms=m * 1e3,
             scan16_per_pair_ms=t16 * 1e3, scan4_per_pair_ms=t4 * 1e3,
             scan_slope_ms=slope * 1e3, penalty_vs_marginal=t16 / m - 1.0,
             slope_penalty=slope / m - 1.0)

    if "--trace" in sys.argv:
        tdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "hs_scan_trace")
        disp, sc, sc4, k16, k4 = build_variant("default")
        u, v = sc(*k16)
        force(u)
        with jax.profiler.trace(tdir):
            u, v = sc(*k16)
            force(u)
            u2, v2 = disp(im1, im2)
            force(u2)
        emit("trace", dir=tdir)

    signal.alarm(0)
    emit("done")


if __name__ == "__main__":
    main()
