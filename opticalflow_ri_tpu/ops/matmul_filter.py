"""Banded-Toeplitz matmul formulation of 1-D stencil correlation (MXU path).

The engine's separable filters (``ops/stencil.correlate1d``) lower to VPU
shift-and-accumulate chains: a k-tap pass costs ~k elementwise ops per pixel
and never touches the MXU.  For the *wide* kernels — Farneback's 33-tap
window blur over the 5-plane M field (ref: src/optical_flow_farneback.cl:
198-253 gaussianBlur5) and the 15-tap polynomial-expansion bases (:72-133) —
that leaves the systolic array idle while the VPU grinds ~66 madds/pixel.

This module re-expresses the same correlation as a *blocked banded matmul*:
pad the array per the border mode (so every block shares one Toeplitz
matrix), slice overlapping blocks of ``block + k - 1`` rows, and contract
each with a static ``(block, block + k - 1)`` Toeplitz band ``T`` built from
the taps — ``out_block = T @ x_block``.  On a v5e the f32 HIGHEST-precision
dot runs at ~33 TFLOP/s vs the VPU's ~2.5 T elem-ops/s, so even with the
dense-block padding waste (``(block + k - 1) / k`` over the ideal band) the
MXU wins for k ≳ 15.

Numerics: the matmul reduces in a different association order than the
linear shift-add chain, so results are NOT bit-identical to
``correlate1d`` — parity is round-off-level (measured ~1e-7 relative on the
Farneback fields; hardware A/B stages in scripts/pallas_ab_results.json).
``Precision.HIGHEST`` keeps the multiply in true f32 (6-pass) — the default
bf16 MXU path would cost ~1e-3 relative error, far outside the oracle
envelope.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from opticalflow_ri_tpu.ops.padding import pad2d

_BLOCKS = (256, 128, 64, 32)


@lru_cache(maxsize=None)
def _toeplitz_block(kernel: tuple, block: int) -> np.ndarray:
    """(block, block + k - 1) band matrix: row i holds the taps at offset i."""
    k = np.asarray(kernel, np.float32)
    n = k.shape[0]
    T = np.zeros((block, block + n - 1), np.float32)
    for i in range(block):
        T[i, i : i + n] = k
    return T


def pick_block(size: int, preferred: int | None = None) -> int | None:
    """Largest supported block dividing ``size`` (None when indivisible)."""
    cands = (preferred,) + _BLOCKS if preferred else _BLOCKS
    for b in cands:
        if b and size % b == 0:
            return b
    return None


def matmul_supports(shape, ksize: int) -> bool:
    """True when both trailing dims admit a block decomposition and the
    kernel is wide enough for the MXU to win (k >= 9; narrower stencils
    stay on the VPU shift-add path)."""
    return (
        ksize >= 9
        and pick_block(shape[-2]) is not None
        and pick_block(shape[-1]) is not None
    )


def matmul_correlate1d(x: jnp.ndarray, kernel, axis: int, mode: str,
                       block: int | None = None) -> jnp.ndarray:
    """``ops.stencil.correlate1d`` semantics (kernel centred at len//2,
    border per ``mode``) as a blocked Toeplitz matmul on the MXU — the
    single-kernel case of :func:`matmul_correlate1d_multi`."""
    return matmul_correlate1d_multi(x, (kernel,), axis, mode, block)[0]


def matmul_correlate1d_multi(x: jnp.ndarray, kernels, axis: int, mode: str,
                             block: int | None = None):
    """Correlate ``x`` with SEVERAL same-length kernels in one blocked
    matmul pass: the Toeplitz blocks stack on a leading axis, so each input
    block is loaded once and contracted against all kernels — k× the
    arithmetic intensity of k separate passes over the same (HBM-bound)
    input.  Returns an array with a new leading kernel axis."""
    kernels = [tuple(float(w) for w in np.asarray(k, np.float32))
               for k in kernels]
    n = len(kernels[0])
    assert all(len(k) == n for k in kernels)
    centre = n // 2
    axis = axis % x.ndim
    assert axis >= x.ndim - 2
    size = x.shape[axis]
    b = pick_block(size, block)
    assert b is not None, (size, "has no supported block; guard with matmul_supports")
    T = jnp.asarray(np.stack([_toeplitz_block(k, b) for k in kernels]))
    nb = size // b
    prec = jax.lax.Precision.HIGHEST

    if axis == x.ndim - 1:
        xp = pad2d(x, ((0, 0), (centre, n - 1 - centre)), mode)
        outs = [
            jnp.einsum("kab,...hb->k...ha", T,
                       xp[..., :, i * b : i * b + b + n - 1], precision=prec)
            for i in range(nb)
        ]
        return jnp.concatenate(outs, axis=-1)

    xp = pad2d(x, ((centre, n - 1 - centre), (0, 0)), mode)
    outs = [
        jnp.einsum("kab,...bw->k...aw", T,
                   xp[..., i * b : i * b + b + n - 1, :], precision=prec)
        for i in range(nb)
    ]
    return jnp.concatenate(outs, axis=-2)


def blur5_flow_matmul(m: jnp.ndarray, taps, mode: str, scale: float,
                      block: int | None = None):
    """Farneback window-blur of the 5-plane M field + regularised 2x2 flow
    solve, with both separable passes on the MXU (y-pass then x-pass, the
    same pass order as the stencil/Pallas paths)."""
    from opticalflow_ri_tpu.models.farneback import update_flow

    out = matmul_correlate1d(m, taps, axis=-2, mode=mode, block=block)
    out = matmul_correlate1d(out, taps, axis=-1, mode=mode, block=block)
    if scale != 1.0:
        out = out * jnp.float32(scale)
    return update_flow(out)
