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
import subprocess
import sys

import pytest

# Keep any accidental CPU fallback deterministic and single-threaded noise down.
os.environ.setdefault("XLA_FLAGS", "")

# Parity tests compare against f64/torch oracles: force true-f32 matmuls/convs
# (TPU default is fast bf16-pass precision, which is what the framework uses in
# production paths via its own compute_dtype settings).
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")


def _platform_already_pinned() -> bool:
    """True if something (e.g. the /tmp/cpuforce.py plugin, or a test
    runner env) already pinned a CPU-only platform list, in which case
    backend init can't hang and the probe is pure overhead.  NOTE: the
    axon terminal exports JAX_PLATFORMS=axon,cpu by default, so a
    non-empty value does NOT mean someone chose deliberately — only an
    all-CPU list is safe to skip on.
    """
    try:
        platforms = jax.config.jax_platforms or ""
    except AttributeError:
        return False
    parts = [p.strip() for p in platforms.split(",") if p.strip()]
    return bool(parts) and all(p == "cpu" for p in parts)


_PROBE_CACHE = "/tmp/picad_tpu_probe.txt"
_PROBE_TTL_S = 600.0


def _tpu_attachment_alive(timeout_s: float = 150.0) -> bool:
    """Probe backend init in a SUBPROCESS with a hard timeout.

    The TPU here is reached through an experimental tunnel whose relay
    process can die mid-session; jax.devices() then blocks indefinitely
    (observed live), which would hang every test file's collection for
    ~25 min.  A subprocess probe bounds that to one timeout per session,
    after which the whole suite falls back to the CPU backend (every
    non-heavy test is backend-agnostic; heavy tests skip on CPU via the
    require_accelerator fixture).  The verdict is cached for 10 min so
    back-to-back pytest invocations don't each pay the probe.
    """
    import time

    try:
        with open(_PROBE_CACHE) as f:
            stamp, verdict = f.read().split()
        if time.time() - float(stamp) < _PROBE_TTL_S:
            return verdict == "alive"
    except (OSError, ValueError):
        pass
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        alive = r.returncode == 0
    except subprocess.TimeoutExpired:
        alive = False
    try:
        with open(_PROBE_CACHE, "w") as f:
            f.write(f"{time.time()} {'alive' if alive else 'dead'}")
    except OSError:
        pass
    return alive


_FORCED_CPU = False
if not _platform_already_pinned() and os.environ.get(
    "PICAD_SKIP_TPU_PROBE", "0"
) != "1":
    if not _tpu_attachment_alive():
        sys.stderr.write(
            "conftest: TPU attachment dead (backend init probe timed out) "
            "— forcing the CPU backend for this session\n"
        )
        jax.config.update("jax_platforms", "cpu")
        _FORCED_CPU = True


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "heavy: full-size model tests (skipped on CPU-only hosts)"
    )
    if _FORCED_CPU:
        # stderr writes at conftest import are swallowed by capture; a
        # warning survives into the -q summary so the fallback is visible
        import warnings

        warnings.warn(
            "TPU attachment dead (probe timed out) — running the suite "
            "on the CPU backend; heavy tests will skip",
            stacklevel=1,
        )


@pytest.fixture(scope="session")
def backend():
    import jax

    return jax.default_backend()


@pytest.fixture
def require_accelerator(backend):
    if backend == "cpu":
        pytest.skip("full-size model test needs an accelerator (too slow on 1-core CPU)")
