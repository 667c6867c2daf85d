"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Correctness tests are device-independent; sharding tests need multiple
devices, which we emulate with XLA's host-platform device splitting.  The
benchmark/driver paths run on real TPU outside pytest.
"""

import os

# The harness pre-sets JAX_PLATFORMS to the TPU tunnel, and the axon
# sitecustomize force-sets jax_platforms="axon,cpu" via jax.config — env vars
# alone do NOT stick.  Re-override through jax.config before any backend
# initialisation so tests run on an 8-virtual-device CPU platform
# (override with OFRI_TEST_PLATFORM=axon to smoke-test on the real chip).
platform = os.environ.get("OFRI_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)
if platform == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

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
