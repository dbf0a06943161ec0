# Test harness configuration: run the suite on a virtual 8-device CPU mesh
# so the data-parallel / sharding paths are exercised without TPU hardware
# (SURVEY §4 "multi-device tests that need no cluster").
#
# Assignment (not setdefault) on purpose: the ambient environment may pin
# JAX_PLATFORMS to a TPU backend; unit tests must stay on CPU. Export
# MEDSEG_TEST_PLATFORM to override.
import os

os.environ["JAX_PLATFORMS"] = os.environ.get("MEDSEG_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    # tests only check numerics; skip expensive CPU backend optimization
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

# Persistent compilation cache: the VNet graphs take minutes to compile on
# CPU; cache them across test runs.
import jax  # noqa: E402

# The axon TPU plugin force-appends itself to jax_platforms regardless of
# the JAX_PLATFORMS env var; pin the config directly so tests really run
# on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms",
                  os.environ.get("MEDSEG_TEST_PLATFORM", "cpu"))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the full tier including slow-marked tests "
             "(~65 min on this 1-core box); the default smoke tier "
             "is ~9 min")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile/e2e tests; excluded from "
        "the default smoke tier, included with --full")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full"):
        return
    import pytest
    skip = pytest.mark.skip(
        reason="slow tier: run with --full (smoke tier is the default)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
