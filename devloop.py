"""Development REPL helper: keeps jax imported, reloads the package and
re-runs tests in-process (fresh-process pytest costs minutes on this host)."""
import importlib
import sys
import os

_platform = os.environ.get("HALIDE_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax as _jax  # noqa: E402

_jax.config.update("jax_platforms", _platform)

sys.path.insert(0, "/root/repo")

# reload order: leaves first
_ORDER = [
    "htypes", "expr", "printer", "visitors", "iroperator", "rdom",
    "schedule", "buffer", "bounds", "eval_jnp", "func", "updates",
    "inline_reductions", "boundary", "wrappers", "rfactor", "specialize",
    "target", "autoschedule", "pipeline", "loopnest",
]


def rl():
    """Reload halide_tpu and clear test module caches."""
    import halide_tpu
    for m in _ORDER:
        full = f"halide_tpu.{m}"
        if full in sys.modules:
            importlib.reload(sys.modules[full])
        else:
            importlib.import_module(full)
    importlib.reload(halide_tpu)
    # extra modules added later
    for full in sorted(list(sys.modules)):
        if full.startswith("halide_tpu.") and \
                full.split(".", 1)[1] not in _ORDER:
            try:
                importlib.reload(sys.modules[full])
            except Exception as e:
                print(f"reload {full}: {e}")
    for full in list(sys.modules):
        if full.startswith("test_") or full.startswith("tests") \
                or full.startswith("lesson_"):
            del sys.modules[full]
    importlib.reload(halide_tpu)
    return halide_tpu


def t(*args):
    """Run pytest in-process: t('tests/test_basics.py', '-k', 'blur')"""
    rl()
    import pytest
    a = list(args) or ["tests", "-x", "-q"]
    if not any(s.startswith("tests") or s.endswith(".py") for s in a):
        a = ["tests"] + a
    if "-q" not in a:
        a.append("-q")
    a += ["-p", "no:cacheprovider"]
    return pytest.main(a)


if __name__ == "__main__":
    import jax
    print("devloop ready;", jax.devices())
