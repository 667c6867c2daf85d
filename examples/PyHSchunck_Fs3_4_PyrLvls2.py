#!/usr/bin/env python3
"""Drop-in equivalent of the reference's examples/PyHSchunck_Fs3_4_PyrLvls2.py: runs the
calibrated 'PyHSchunck_Fs3_4_PyrLvls2' configuration on the bundled PIV pair and saves the
flow as .mat.  Extra CLI flags (--im1/--im2/--out) pass through to
run_config.py."""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
os.execv(sys.executable,
         [sys.executable, os.path.join(HERE, "run_config.py"), "PyHSchunck_Fs3_4_PyrLvls2"]
         + sys.argv[1:])
