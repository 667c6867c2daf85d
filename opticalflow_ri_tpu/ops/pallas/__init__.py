"""Pallas TPU kernels — the native kernel layer.

The reference's native layer is two OpenCL C files (SURVEY.md section 2.2);
here the equivalents are Mosaic/Pallas kernels.  Each kernel has an XLA
fallback in its solver (``impl="xla"``): Pallas engages on TPU backends for
shapes that tile cleanly, and the fallbacks keep CPU tests and odd shapes
working.  Parity between both paths is asserted in tests.
"""
