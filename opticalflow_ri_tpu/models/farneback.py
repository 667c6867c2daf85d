"""Farneback polynomial-expansion optical flow, TPU-native (placeholder).

Full implementation lands with the fused 5-plane blur pipeline; see SURVEY.md
section 2.2 items 2-6 (ref: src/Farneback_PyCL.py + src/optical_flow_farneback.cl).
"""

from __future__ import annotations


class FarnebackAdapter:
    def __init__(self, windowSize: int = 33, Niters: int = 5, polyN: int = 7,
                 polySigma: float = 1.5, useGaussian: bool = True,
                 pyrScale: float = 0.5, pyramidalLevels: int = 1,
                 provideGenericPyramidalDefaults: bool = True):
        self.windowSize = windowSize
        self.numIters = Niters
        self.polyN = int(polyN)
        self.polySigma = polySigma
        self.useGaussianFilter = useGaussian
        self.pyrScale = pyrScale
        self.pyramidalLevels = pyramidalLevels - 1
        self.provideGenericPyramidalDefaults = provideGenericPyramidalDefaults

    def compute(self, im1, im2, U, V):
        raise NotImplementedError("Farneback lands in the next milestone")

    def getAlgoName(self):
        return "TPU Farneback"

    def hasGenericPyramidalDefaults(self):
        return self.provideGenericPyramidalDefaults

    def getGenericPyramidalDefaults(self):
        return {"warping": False, "scaling": True}
