"""Masked separable window sums via static hierarchical box decomposition.

The LK window weights are 0/1 masks over the 32-sample grid
(ref: src/pyrlkDenseLargeW.cl:321-374); a masked window sum decomposes into
maximal runs of ones.  Two decompositions, selected per call site:

  * direct — the plain L-tap slice sum.  XLA fuses it into ONE kernel per
    axis with zero materialised intermediates; fast for one-shot sums on
    small fields (structure tensor).
  * hierarchical — each run of length L into ~2*sqrt(L) static slice-adds
    (a base box of width a ~= sqrt(L) reused by b = L // a strided slices
    plus remainder taps).  Used inside Pallas kernels (lane-offset slices
    lower to VPU rotates, op count dominates) AND for the XLA shift-plane
    build: the 338-plane build is VPU-add-bound, and the v5e A/B measured
    hierarchical at 2.0x direct (6.58 -> 3.25 ms prep+build at 512^2,
    scripts/lk_breakdown.json) despite the materialised base.

Shared by the XLA shift-plane build (models/lucas_kanade.py) and the fused
Pallas LK kernel (ops/pallas/lk_iter.py) so both paths keep the exact same
f32 summation order.
"""

from __future__ import annotations

import numpy as np
from jax import lax


def runs_from_mask(mask: np.ndarray):
    """Decompose a static 0/1 weight vector into maximal runs of ones."""
    runs = []
    start = None
    for idx, m in enumerate(mask.tolist() + [0.0]):
        if m != 0.0 and start is None:
            start = idx
        elif m == 0.0 and start is not None:
            runs.append((start, idx - 1))
            start = None
    return tuple(runs)


def windowed_sum_axis(x, runs, half_window, axis, out_len, hierarchical=False):
    """sum_k mask[k] * x[p + k - half_window] along ``axis``.  ``x`` covers
    positions [-hw, out_len-1+GRID-1-hw] relative to the output origin.

    ``hierarchical=False`` (default) emits the direct L-tap slice sum: one
    fused XLA kernel per axis with no materialised base array — on TPU the
    build is HBM-bound on intermediates, not VPU-bound on adds, so fewer
    materialisations beat fewer adds.  ``hierarchical=True`` keeps the
    ~2*sqrt(L) two-level decomposition (base box + strided reuse), which is
    preferred inside Pallas kernels where lane-offset slices lower to VPU
    rotates and op count dominates."""
    size = x.shape[axis]
    out = None
    for lo, hi in runs:
        L = hi - lo + 1
        a = max(1, int(round(L ** 0.5))) if hierarchical else 1
        b = L // a
        if a == 1:
            base = x
        else:
            base = None
            for i in range(a):
                t = lax.slice_in_dim(x, i, size - a + 1 + i, axis=axis)
                base = t if base is None else base + t
        term = None
        for j in range(b):
            s = lo + a * j
            t = lax.slice_in_dim(base, s, s + out_len, axis=axis)
            term = t if term is None else term + t
        for k in range(lo + a * b, hi + 1):
            t = lax.slice_in_dim(x, k, k + out_len, axis=axis)
            term = t if term is None else term + t
        out = term if out is None else out + term
    return out


def wsum2d(x, runs_y, runs_x, hw, out_h, out_w, hierarchical=False):
    """Separable masked window sum of ``x`` (covering the padded off-domain)
    down to the (out_h, out_w) pixel grid (x-axis pass first)."""
    t = windowed_sum_axis(x, runs_x, hw, x.ndim - 1, out_w, hierarchical)
    return windowed_sum_axis(t, runs_y, hw, x.ndim - 2, out_h, hierarchical)
