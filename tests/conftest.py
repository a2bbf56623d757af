"""Test configuration.

The suite runs on whatever backend JAX picks (TPU when available, CPU
otherwise).  Heavyweight full-model tests are skipped on CPU-only hosts
(this image has a single CPU core; a full 224^2 I3D compile takes
minutes there) — they run on the TPU.  Multi-device sharding tests spawn
a subprocess with a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), since the platform
must be chosen before JAX initializes.
"""

import os

import pytest

# Keep any accidental CPU fallback deterministic and single-threaded noise down.
os.environ.setdefault("XLA_FLAGS", "")

# Parity tests compare against f64/torch oracles: force true-f32 matmuls/convs
# (TPU default is fast bf16-pass precision, which is what the framework uses in
# production paths via its own compute_dtype settings).
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "heavy: full-size model tests (skipped on CPU-only hosts)"
    )


@pytest.fixture(scope="session")
def backend():
    import jax

    return jax.default_backend()


@pytest.fixture
def require_accelerator(backend):
    if backend == "cpu":
        pytest.skip("full-size model test needs an accelerator (too slow on 1-core CPU)")
