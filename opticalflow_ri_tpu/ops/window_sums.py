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


def _smooth_factorization(L: int):
    """Min-cost 2/3/5-smooth decomposition: the smooth L' <= L (returned as
    its factor list, plus the remainder L - L') minimising total sliding-sum
    adds = sum(f - 1 for f in factors) + (L - L').  Note this is NOT simply
    the largest smooth L' <= L — e.g. L=26 picks 24 (cost 6+2) over 25
    (cost 8+1)."""
    best = (L - 1, [], L)  # (adds, factors, remainder) — all-direct fallback
    for lp in range(L, 0, -1):
        m, factors = lp, []
        for f in (2, 3, 5):
            while m % f == 0:
                m //= f
                factors.append(f)
        if m != 1:
            continue
        adds = sum(f - 1 for f in factors) + (L - lp)
        if adds < best[0]:
            best = (adds, sorted(factors), L - lp)
    return best[1], best[2]


def _ladder_run(x, lo, L, size, axis, out_len):
    """Width-L sliding sum starting at offset ``lo`` via a factor ladder:
    S_1 = x;  S_{m*f}(c) = sum_{j<f} S_m(c + j*m).  A width-27 window costs
    6 adds/element (3*3*3) vs 11 for the two-level hierarchical form."""
    factors, rem = _smooth_factorization(L)
    s, m = x, 1
    for f in factors:
        n = s.shape[axis]
        nxt = None
        for j in range(f):
            t = lax.slice_in_dim(s, j * m, n - (f - 1) * m + j * m, axis=axis)
            nxt = t if nxt is None else nxt + t
        s, m = nxt, m * f
    term = lax.slice_in_dim(s, lo, lo + out_len, axis=axis)
    for k in range(lo + m, lo + L):
        term = term + lax.slice_in_dim(x, k, k + out_len, axis=axis)
    return term


def windowed_sum_axis(x, runs, half_window, axis, out_len, hierarchical=False):
    """sum_k mask[k] * x[p + k - half_window] along ``axis``.  ``x`` covers
    positions [-hw, out_len-1+GRID-1-hw] relative to the output origin.

    ``hierarchical=False`` (default) emits the direct L-tap slice sum;
    ``hierarchical=True`` the ~2*sqrt(L) two-level decomposition (base box
    + strided reuse); ``hierarchical="ladder"`` the factor-ladder form
    (sum(f-1) adds over a 2/3/5-smooth factorization — 6 adds for L=27)."""
    size = x.shape[axis]
    out = None
    for lo, hi in runs:
        L = hi - lo + 1
        if hierarchical == "ladder":
            term = _ladder_run(x, lo, L, size, axis, out_len)
            out = term if out is None else out + term
            continue
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
