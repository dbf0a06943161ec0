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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
