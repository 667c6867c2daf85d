"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Correctness tests are device-independent; sharding tests need multiple
devices, which we emulate with XLA's host-platform device splitting.  The
benchmark/driver paths run on real TPU outside pytest.
"""

import os

# The harness pre-sets JAX_PLATFORMS to the TPU tunnel; tests run on the CPU
# backend (override with OFRI_TEST_PLATFORM=axon to smoke-test on device).
os.environ["JAX_PLATFORMS"] = os.environ.get("OFRI_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def piv_pair_small():
    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

    return particle_image_pair(shape=(96, 96), seed=3, max_disp=2.5)


@pytest.fixture(scope="session")
def piv_pair_medium():
    from opticalflow_ri_tpu.utils.synthetic import particle_image_pair

    return particle_image_pair(shape=(160, 128), seed=7, max_disp=3.0)


@pytest.fixture(scope="session")
def reference_images():
    """The reference's bundled 512x512 PIV pair, when available."""
    base = "/root/reference/examples/testImages/Bits08/Ni06"
    p0 = os.path.join(base, "parabolic01_0.tif")
    p1 = os.path.join(base, "parabolic01_1.tif")
    if not (os.path.exists(p0) and os.path.exists(p1)):
        pytest.skip("reference test images not available")
    from opticalflow_ri_tpu.utils.io import load_image

    return load_image(p0), load_image(p1)


def aee(u, v, u_ref, v_ref):
    """Average endpoint error between two flow fields."""
    return float(
        np.mean(np.hypot(np.asarray(u) - u_ref, np.asarray(v) - v_ref))
    )
