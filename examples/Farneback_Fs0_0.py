#!/usr/bin/env python3
"""Drop-in equivalent of the reference's examples/Farneback_Fs0_0.py: runs the
calibrated 'Farneback_Fs0_0' configuration on the bundled PIV pair and saves the
flow as .mat.  Extra CLI flags (--im1/--im2/--out) pass through to
run_config.py."""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
os.execv(sys.executable,
         [sys.executable, os.path.join(HERE, "run_config.py"), "Farneback_Fs0_0"]
         + sys.argv[1:])
