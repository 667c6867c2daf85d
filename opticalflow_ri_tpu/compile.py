"""Whole-pipeline compilation: one XLA program per (config, image shape).

The reference executes its pipeline as dozens of host-orchestrated stages with
full host<->device copies around each (SURVEY.md section 3.5); the staged
driver in ``pyramid.py`` already keeps data on device, but still pays a
dispatch + (on a tunneled TPU) RPC round trip per stage.  This module traces
an entire calibrated configuration — pyramid levels, filters, warps, solver
iterations, optional refiner — into a single jitted program, so running a pair
is ONE dispatch.  Adapter statefulness (the HS alpha list) resolves at trace
time, exactly like the reference resolves it at run time.

    fn = compiled_pipeline("PyHSchunck_Fs3_4")
    U, V = fn(im1, im2)                      # one XLA execution

Batched throughput uses ``scan_pipeline`` (one dispatch, pairs processed
sequentially on device with the single-pair working set); the vmapped
``batched_pipeline`` is deprecated — see its docstring.
"""

from __future__ import annotations

from functools import lru_cache

import jax

from opticalflow_ri_tpu.configs import build_config


def pipeline_fn(name: str):
    """A pure (im1, im2) -> (U, V) function for a named calibrated config.
    Fresh adapters are constructed per trace, so stateful calibration lists
    reset correctly."""
    cfg = build_config(name)

    def fn(im1, im2):
        return cfg.run(im1, im2)

    return fn


@lru_cache(maxsize=None)
def compiled_pipeline(name: str):
    """Jitted whole-config pipeline (cached per config name; XLA caches per
    input shape)."""
    return jax.jit(pipeline_fn(name))


@lru_cache(maxsize=None)
def batched_pipeline(name: str):
    """DEPRECATED: jitted vmapped pipeline over a leading batch axis.

    Measured 4.7x slower than ``scan_pipeline`` on a v5e at 512^2 (22.7 vs
    106.4 Mpix/s, bench_details.json): vmap multiplies the working set by the
    batch size, spilling VMEM, while scan keeps the single-pair working set
    and the same one-dispatch amortisation.  Kept for API compatibility;
    use ``scan_pipeline`` for throughput streaming.

    Dispatches solvers to their XLA paths: vmapping a whole-solve Pallas
    kernel batches its grid — an unproven variant whose working set breaks
    the kernel's VMEM-residency premise — whereas scan keeps the single-pair
    kernels exactly as validated (see scan_pipeline)."""
    import warnings

    warnings.warn(
        "batched_pipeline (vmap) is deprecated: it measures ~4.7x slower "
        "than scan_pipeline on TPU at 512^2; use scan_pipeline",
        DeprecationWarning, stacklevel=2,
    )
    fn = jax.vmap(pipeline_fn(name))

    def batched(im1s, im2s):
        from opticalflow_ri_tpu.ops.pallas import force_xla

        with force_xla():  # dispatch resolves at trace time
            return fn(im1s, im2s)

    return jax.jit(batched)


@lru_cache(maxsize=None)
def scan_pipeline(name: str):
    """Jitted pipeline that processes a (K, H, W) stack of pairs
    *sequentially on device* with ``lax.scan``: one dispatch, single-pair
    working set (no VMEM spill), K x marginal-cost runtime — the production
    streaming construct."""
    fn = pipeline_fn(name)

    def scanned(im1s, im2s):
        def step(carry, pair):
            u, v = fn(pair[0], pair[1])
            return carry, (u, v)

        _, (us, vs) = jax.lax.scan(step, None, (im1s, im2s))
        return us, vs

    return jax.jit(scanned)
