"""Test configuration: force an 8-device virtual CPU mesh.

The reference was only ever tested single-process on local GPUs
(nn.DataParallel, trainer.py:255-265).  Our test pyramid instead validates
multi-chip sharding on every run by forcing XLA's host platform to expose 8
virtual devices; the same code path then runs unchanged on a real TPU slice.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Never touch the network in tests.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# This image's sitecustomize imports jax at interpreter startup and registers
# the axon TPU backend, so env-var selection (JAX_PLATFORMS) is already
# latched; switch the platform through the live config instead.  Backends are
# initialized lazily, so the XLA_FLAGS set above still yields 8 virtual CPU
# devices.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
