"""Oracle Horn-Schunck solver (semantics of ref: src/HornSchunck.py).

Written from the documented equations: 2x2 mirror-border derivative stencils,
3x3 neighbour-average Jacobi relaxation, normalised Frobenius error, and the
frame-role swap quirk folded in (ft = avg2x2(frame0) - avg2x2(frame1))."""

from __future__ import annotations

import numpy as np
from scipy.ndimage import convolve as filter2

_AVG = np.array(
    [[1 / 12, 1 / 6, 1 / 12], [1 / 6, 0, 1 / 6], [1 / 12, 1 / 6, 1 / 12]],
    np.float32,
)
_KX = np.array([[-1, 1], [-1, 1]], np.float32) * 0.25
_KY = np.array([[-1, -1], [1, 1]], np.float32) * 0.25
_KT = np.ones((2, 2), np.float32) * 0.25


def derivatives(frame0: np.ndarray, frame1: np.ndarray):
    fx = filter2(frame1, _KX, mode="mirror") + filter2(frame0, _KX, mode="mirror")
    fy = filter2(frame1, _KY, mode="mirror") + filter2(frame0, _KY, mode="mirror")
    ft = filter2(frame0, _KT, mode="mirror") + filter2(frame1, -_KT, mode="mirror")
    return fx, fy, ft


def hs_solve(frame0, frame1, alpha, niter, u0, v0):
    fx, fy, ft = derivatives(
        np.asarray(frame0, np.float32), np.asarray(frame1, np.float32)
    )
    alpha = np.float32(alpha)
    u = np.asarray(u0, np.float32)
    v = np.asarray(v0, np.float32)
    for _ in range(niter):
        u_avg = filter2(u, _AVG, mode="mirror")
        v_avg = filter2(v, _AVG, mode="mirror")
        der = (fx * u_avg + fy * v_avg + ft) / (alpha**2 + fx**2 + fy**2)
        u = u_avg - fx * der
        v = v_avg - fy * der
    npix = u.shape[0] * u.shape[1]
    err = (np.linalg.norm(u - u0) + np.linalg.norm(v - v0)) / npix
    return u, v, float(err)


class OracleHSAdapter:
    def __init__(self, alphas, niter):
        self.alphas = list(alphas)
        self.niter = niter

    def compute(self, im1, im2, U, V):
        alpha = self.alphas.pop()
        return hs_solve(im1, im2, alpha, self.niter, U, V)

    def getAlgoName(self):
        return "Oracle Horn-Schunck"

    def hasGenericPyramidalDefaults(self):
        return True

    def getGenericPyramidalDefaults(self):
        return {"warping": True, "biLinear": True, "scaling": True}
