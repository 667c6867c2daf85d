#!/usr/bin/env python3
"""Calibrated config "denseLK_Fs2_0" — dense windowed Lucas-Kanade
(ref: examples/denseLK_Fs2_0.py): sigma=2.0 pre-filter, single level,
27x27 window (halfWindow=13), 5 Gauss-Newton iterations, FILTER_OPT=0.48,
warping disabled (the reference LK adapter's pyramidal default,
ref: src/denseLucasKanade_PyCL.py:177-182).

    python3 examples/denseLK_Fs2_0.py [--im1 a.tif --im2 b.tif --out flow.mat]
"""
import _example_lib  # noqa: F401  (must be first: backend env setup)

from opticalflow_ri_tpu import DenseLucasKanadeAdapter

if __name__ == "__main__":
    _example_lib.run_example(
        "denseLK_Fs2_0",
        DenseLucasKanadeAdapter(Niter=5, halfWindow=13),
        filter_sigma=2.0, pyr_levels=1, filter_opt=0.48, warping=False,
    )
