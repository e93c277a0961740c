"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-chip testing strategy: sharding/pjit paths are exercised on
CPU devices (SURVEY.md §4), while TPU benchmarks run via bench.py.

Note: this environment's sitecustomize imports jax at interpreter startup to
register the TPU plugin, so JAX_PLATFORMS must be set via jax.config (env
vars are read once at jax import). XLA_FLAGS is still honored because
backends initialize lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: do not enable the persistent compilation cache here — the XLA:CPU
# AOT loader flags machine-feature mismatches on this host (+prefer-no-
# scatter/-gather) and reloaded code can SIGILL.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules: the XLA:CPU JIT
    segfaulted twice deep into full-suite runs (inside
    backend_compile_and_load, hundreds of cached executables in-process)
    while the same test passed alone — bounding the live compilation state
    avoids it, and caps the suite's memory growth."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def input_images():
    """The 4-image Input/ dataset (384x512 BMPs) as RGB uint8 arrays."""
    from computervisionimagestich2_tpu.utils import load_image

    return [load_image(f"{REFERENCE}/Input/{i}.bmp") for i in range(1, 5)]


@pytest.fixture()
def rng():
    """Function-scoped: each test draws from a fresh seed-0 stream, so test
    data never depends on which tests ran before (a session-scoped stream
    made gates order-dependent: adding a test upstream reshuffled every
    later test's scene)."""
    return np.random.default_rng(0)
