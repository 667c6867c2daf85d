"""Oracle Liu-Shen solver (semantics of ref: src/PhysicsBasedOpticalFlowLiuShen.py).

Correlations with the original MATLAB-orientation kernels ('nearest' border,
H-kernel terms zero-padded), global-max image normalisation, fixed-point
iteration with tol 1e-8 / max 60, component swap handled by the adapter."""

from __future__ import annotations

import numpy as np
from scipy.ndimage import correlate as ndcorr

_D1 = np.array([[0, -1, 0], [0, 0, 0], [0, 1, 0]], np.float32) / 2.0
_D2 = _D1.T
_F1 = np.array([[0, 1, 0], [0, 0, 0], [0, 1, 0]], np.float32)
_F2 = _F1.T
_M = np.array([[1, 0, -1], [0, 0, 0], [-1, 0, 1]], np.float32) / 4.0
_DD = np.array([[0, 1, 0], [0, -2, 0], [0, 1, 0]], np.float32)
_H = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], np.float32)


def _c(x, k, mode="nearest"):
    return ndcorr(x, k, mode=mode)


def liu_shen_solve(im1, im2, h, u0, v0, max_iter=60, tol=1e-8):
    im1 = np.asarray(im1, np.float32) / np.max(im1)
    im2 = np.asarray(im2, np.float32) / np.max(im2)
    h = np.float32(h)

    iix = im1 * _c(im1, _D1)
    iiy = im1 * _c(im1, _D2)
    ii = im1 * im1
    dt = im2 - im1
    ixt = im1 * _c(dt, _D1)
    iyt = im1 * _c(dt, _D2)

    cmtx = _c(np.ones_like(im1), _H, mode="constant")
    a11 = im1 * (_c(im1, _DD) - 2 * im1) - h * cmtx
    a22 = im1 * (_c(im1, _DD.T) - 2 * im1) - h * cmtx
    a12 = im1 * _c(im1, _M)
    det = a11 * a22 - a12 * a12
    b11, b12, b22 = a22 / det, -a12 / det, a11 / det

    u = np.asarray(u0, np.float32)
    v = np.asarray(v0, np.float32)
    npix = u.shape[0] * u.shape[1]
    err = 0.0
    total = 1e8
    k = 0
    while total > tol and k < max_iter:
        bu = (
            2 * iix * _c(u, _D1) + iix * _c(v, _D2) + iiy * _c(v, _D1)
            + ii * _c(u, _F1) + ii * _c(v, _M)
            + h * _c(u, _H, mode="constant") + ixt
        )
        bv = (
            iiy * _c(u, _D1) + iix * _c(u, _D2) + 2 * iiy * _c(v, _D2)
            + ii * _c(u, _M) + ii * _c(v, _F2)
            + h * _c(v, _H, mode="constant") + iyt
        )
        u_new = -(b11 * bu + b12 * bv)
        v_new = -(b12 * bu + b22 * bv)
        total = (np.linalg.norm(u_new - u) + np.linalg.norm(v_new - v)) / npix
        u, v = u_new, v_new
        err = total
        k += 1
    return u, v, float(err)


class OracleLiuShenAdapter:
    def __init__(self, alpha):
        self.alpha = alpha

    def compute(self, im1, im2, U, V):
        rv, ru, err = liu_shen_solve(im1, im2, self.alpha, V, U)
        return [ru, rv, err]

    def getAlgoName(self):
        return "Oracle Liu-Shen"

    def hasGenericPyramidalDefaults(self):
        return False
