"""Test config: run on a virtual 8-device CPU mesh with float64 enabled.

Mirrors SURVEY.md §4's plan — multi-host code paths are exercised via
``--xla_force_host_platform_device_count`` so distributed BA is testable
without a TPU pod; float64 gives parity with the all-double reference for
geometry tests.

NOTE: this sandbox pre-imports jax (sitecustomize) with a remote TPU backend;
``jax.config.update('jax_platforms', 'cpu')`` after import is the supported way
to pin tests to the host CPU.
"""

import os
import subprocess

# fresh-clone friendliness: the native host library (SSC ANMS) is a build
# product; make sure it exists before any test imports sdvo_tpu.features.ssc
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_so = os.path.join(_repo, "native", "libsdvo_host.so")
if not os.path.exists(_so):
    subprocess.run(["make", "-C", os.path.join(_repo, "native")], check=False)

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
