"""Test configuration: run everything on CPU with 8 virtual devices.

Mirrors the reference's absence of any GPU/TPU requirement for correctness
(the reference is CPU-only C++) while letting every collective in
fealess_tpu.parallel run on a virtual 8-device mesh — the standard JAX
analog of a fake backend (SURVEY.md §4d).

Must run before jax is imported anywhere, hence the env mutation at module
import time (pytest imports conftest first).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)
