"""Dense windowed Lucas-Kanade optical flow, TPU-native (placeholder).

Full implementation lands with the shift-plane gather-free formulation; see
SURVEY.md section 2.2 item 1 (ref: src/denseLucasKanade_PyCL.py +
src/pyrlkDenseLargeW.cl).
"""

from __future__ import annotations


class DenseLucasKanadeAdapter:
    def __init__(self, Niter: int = 5, halfWindow: int = 13,
                 provideGenericPyramidalDefaults: bool = True,
                 enableVorticityEnhancement: bool = False):
        self.Niter = Niter
        self.halfWindow = halfWindow
        self.provideGenericPyramidalDefaults = provideGenericPyramidalDefaults
        self.enableVorticityEnhancement = enableVorticityEnhancement

    def compute(self, im1, im2, U, V):
        raise NotImplementedError("dense LK lands in the next milestone")

    def getAlgoName(self):
        return "TPU Dense LK"

    def hasGenericPyramidalDefaults(self):
        return self.provideGenericPyramidalDefaults

    def getGenericPyramidalDefaults(self):
        return {"warping": False, "intermediateScaling": True, "scaling": False}
