"""Test env: force CPU JAX with a virtual 8-device mesh (SURVEY.md §4.4).

NOTE: this machine exports JAX_PLATFORMS=axon (TPU tunnel) and the axon
plugin wins over a plain env override — so we must update jax.config
AFTER import, before any backend touch. Runs first because conftest.py
is imported before test modules.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy model-path test (>~30 s on the 1-core CI host). "
        "`-m 'not slow'` is the fast set (target <5 min total); CI-grade "
        "verification runs it every time, the full suite stays the "
        "release gate.")
