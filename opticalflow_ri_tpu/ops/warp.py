"""Sub-pixel image warping for the pyramidal driver.

Replicates the reference's two warp modes
(ref: src/GenericPyramidalOpticalFlow.py:70-116, :198-221):

  * ``bilinear_warp_rounded`` — the driver's default "BiLinear" warp.  NOTE the
    reference does NOT use conventional floor-based bilinear sampling: it
    rounds the coordinate to the nearest integer (numpy round-half-even),
    picks the second tap on the side of the fractional remainder's sign, and
    blends with |frac| weights, clamping all taps to the image.  We reproduce
    that exactly (jnp.round is also half-even).
  * ``liu_shen_warp`` — the alternative optical-flow-equation warp: integer
    scatter shift plus a first-order intensity correction from the smoothed
    sub-pixel residual flow.  (No calibrated example exercises this mode; the
    scatter uses last-write-wins like numpy fancy assignment, which JAX's
    scatter does not guarantee under duplicate indices — documented caveat.)

Gathers here run once per pyramid level (not in the iteration hot loop), so
XLA's native gather is used; the hot solver loops never gather.
"""

from __future__ import annotations

import jax.numpy as jnp

from opticalflow_ri_tpu.ops.gaussian import gaussian_filter


def _gather2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    return img[iy, ix]


def bilinear_warp_rounded(img: jnp.ndarray, coords_y: jnp.ndarray, coords_x: jnp.ndarray) -> jnp.ndarray:
    """Warp ``img`` sampling at (coords_y, coords_x) with the reference's
    round-to-nearest + signed-neighbour bilinear scheme
    (ref: src/GenericPyramidalOpticalFlow.py:70-116)."""
    h, w = img.shape[-2], img.shape[-1]

    iy = jnp.round(coords_y).astype(jnp.int32)
    ix = jnp.round(coords_x).astype(jnp.int32)
    dy = coords_y - iy
    dx = coords_x - ix

    iyn = jnp.where(dy < 0, iy - 1, iy + 1)
    ixn = jnp.where(dx < 0, ix - 1, ix + 1)
    dy = jnp.abs(dy)
    dx = jnp.abs(dx)

    iy = jnp.clip(iy, 0, h - 1)
    iyn = jnp.clip(iyn, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    ixn = jnp.clip(ixn, 0, w - 1)

    p00 = _gather2d(img, iy, ix)
    p01 = _gather2d(img, iy, ixn)
    p10 = _gather2d(img, iyn, ix)
    p11 = _gather2d(img, iyn, ixn)

    return (
        (1 - dy) * (1 - dx) * p00
        + (1 - dy) * dx * p01
        + dy * (1 - dx) * p10
        + dy * dx * p11
    ).astype(jnp.float32)


def symmetric_warp_pair(im1: jnp.ndarray, im2: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Symmetric half-displacement warp of an image pair: im1 backwards by
    (u/2, v/2), im2 forwards — the driver's warping step
    (ref: src/GenericPyramidalOpticalFlow.py:198-201)."""
    h, w = im1.shape[-2], im1.shape[-1]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)
    w1 = bilinear_warp_rounded(im1, ys - v / 2.0, xs - u / 2.0)
    w2 = bilinear_warp_rounded(im2, ys + v / 2.0, xs + u / 2.0)
    return w1, w2


def liu_shen_warp(im1: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Optical-flow-equation warp of im1 by (u, v)
    (ref: src/GenericPyramidalOpticalFlow.py:204-221)."""
    h, w = im1.shape[-2], im1.shape[-1]
    ys = jnp.arange(h, dtype=jnp.int32)[:, None] + jnp.zeros((1, w), jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)[None, :] + jnp.zeros((h, 1), jnp.int32)

    ui = jnp.floor(u + 0.5)
    vi = jnp.floor(v + 0.5)
    xdst = (xs + ui.astype(jnp.int32))
    ydst = (ys + vi.astype(jnp.int32))
    # numpy semantics: negative indices wrap; we additionally clip the high end
    # (where the reference would fault).
    xdst = jnp.clip(jnp.where(xdst < 0, xdst + w, xdst), 0, w - 1)
    ydst = jnp.clip(jnp.where(ydst < 0, ydst + h, ydst), 0, h - 1)
    shifted = im1.at[ydst, xdst].set(im1)

    du = gaussian_filter(u - ui.astype(u.dtype), 0.6 * 3, 4.0 / 0.6 * 3)
    dv = gaussian_filter(v - vi.astype(v.dtype), 0.6 * 3, 4.0 / 0.6 * 3)

    t_dx = shifted[:-1, 1:] * du[:-1, 1:] - shifted[:-1, :-1] * du[:-1, :-1]
    t_dy = shifted[1:, :-1] * dv[1:, :-1] - shifted[:-1, :-1] * dv[:-1, :-1]
    corrected = shifted.at[:-1, :-1].add(-(t_dx + t_dy))
    return corrected
