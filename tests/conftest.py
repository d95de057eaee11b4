import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# compile+execute without TPU hardware (the WasmExecutor-style fake backend —
# see SURVEY.md §4). Must be set before jax import.
_platform = os.environ.get("HALIDE_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the axon TPU plugin forces itself regardless of JAX_PLATFORMS; pin the
# config explicitly
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
