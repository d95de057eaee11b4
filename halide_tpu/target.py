"""Target descriptions (reference: src/Target.h:85-208, src/Target.cpp).

A Target here is `tpu-<generation>[-feature...]`, e.g. "tpu-v5e-profile".
`host` resolves to the attached accelerator (or cpu interpret mode).
Env vars HL_TARGET / HL_JIT_TARGET are honored like the reference.
"""
from __future__ import annotations

import os
from typing import FrozenSet, Optional

__all__ = ["Target", "get_host_target", "get_jit_target_from_environment",
           "get_target_from_environment"]

_KNOWN_ARCH = {"tpu", "cpu", "host"}
_KNOWN_GEN = {"v4", "v5e", "v5p", "v6e", "generic"}
_KNOWN_FEATURES = {
    "profile", "trace_all", "trace_loads", "trace_stores",
    "trace_realizations", "debug", "no_asserts", "interpret",
    "no_pallas", "megacore", "strict_float", "jit",
}


class Target:
    def __init__(self, spec: Optional[str] = None, arch: str = "host",
                 generation: str = "generic",
                 features: Optional[FrozenSet[str]] = None):
        self.arch = arch
        self.generation = generation
        self.features = set(features or ())
        if spec:
            self._parse(spec)
        if self.arch == "host":
            t = get_host_target()
            self.arch = t.arch
            if self.generation == "generic":
                self.generation = t.generation

    def _parse(self, spec: str):
        parts = spec.split("-")
        for i, p in enumerate(parts):
            if i == 0 and p in _KNOWN_ARCH:
                self.arch = p
                continue
            if p in _KNOWN_GEN:
                self.generation = p
                continue
            if p in _KNOWN_FEATURES:
                self.features.add(p)
                continue
            raise ValueError(f"unknown target component {p!r} in {spec!r}")

    def has_feature(self, f: str) -> bool:
        return f in self.features

    def with_feature(self, f: str) -> "Target":
        return Target(arch=self.arch, generation=self.generation,
                      features=frozenset(self.features | {f}))

    def without_feature(self, f: str) -> "Target":
        return Target(arch=self.arch, generation=self.generation,
                      features=frozenset(self.features - {f}))

    def __str__(self):
        parts = [self.arch, self.generation] + sorted(self.features)
        return "-".join(parts)

    def __repr__(self):
        return f"Target({str(self)!r})"

    def __eq__(self, o):
        return (isinstance(o, Target) and self.arch == o.arch
                and self.generation == o.generation
                and self.features == o.features)

    def __hash__(self):
        return hash((self.arch, self.generation, frozenset(self.features)))


_host_cache = None


def get_host_target() -> Target:
    global _host_cache
    if _host_cache is None:
        arch, gen = "cpu", "generic"
        try:
            import jax
            for d in jax.devices():
                kind = getattr(d, "device_kind", "").lower()
                if "tpu" in kind or d.platform in ("tpu", "axon"):
                    arch = "tpu"
                    for g in ("v6e", "v5p", "v5e", "v4"):
                        tag = g.replace("e", " lite") if g.endswith("e") else g
                        if g in kind or tag in kind:
                            gen = g
                            break
                    else:
                        if "v5 lite" in kind or "lite" in kind:
                            gen = "v5e"
                    break
        except Exception:
            pass
        _host_cache = Target(arch=arch, generation=gen)
    return Target(arch=_host_cache.arch, generation=_host_cache.generation)


# ---------------------------------------------------------------------------
# Per-generation hardware peaks for the roofline/MFU accounting
# (reference point: apps/cuda_mat_mul pins its baseline to device peak the
# same way). Sources: published TPU spec sheets. The f32 "peak" is the
# HIGHEST-precision 6-pass MXU decomposition (exact f32 products emulated
# from bf16 passes), i.e. bf16_peak / 6 — measured sgemm lands on it.
# ---------------------------------------------------------------------------
MXU_PEAK_TFLOPS_BF16 = {
    "v4": 275.0, "v5e": 197.0, "v5p": 459.0, "v6e": 918.0,
    "generic": 197.0,
}
HBM_GBPS = {
    "v4": 1228.0, "v5e": 819.0, "v5p": 2765.0, "v6e": 1640.0,
    "generic": 819.0,
}
F32_PASSES = 6   # HIGHEST: exact f32 via 6 bf16 MXU passes


def mxu_peak_tflops(dtype: str = "bf16", generation: str = None) -> float:
    """Peak MXU TFLOPS for the given matmul operand dtype on the host (or
    named) TPU generation."""
    gen = generation or get_host_target().generation
    peak = MXU_PEAK_TFLOPS_BF16.get(gen, MXU_PEAK_TFLOPS_BF16["generic"])
    if dtype in ("f32", "float32"):
        return peak / F32_PASSES
    return peak


def hbm_gbps(generation: str = None) -> float:
    gen = generation or get_host_target().generation
    return HBM_GBPS.get(gen, HBM_GBPS["generic"])


# ---------------------------------------------------------------------------
# Fitted autoscheduler cost-model constants, per TPU generation
# (reference: adams2019 trains DefaultCostModel.cpp:180 against measured
# runtimes; here the three-term analytical model's coefficients are FIT to
# hardware measurements instead of hand-coded).
# Provenance: `python -m halide_tpu.tools.fitcost` measures (a) HBM stream
# bandwidth via a jitted triad, (b) VPU elementwise throughput via the
# chain-length slope on a resident tile, and (c) the dual-strided fused-
# read slowdown via a DSL A/B (inline vs compute_root of a stride-2x2
# producer). v5e row measured on TPU v5 litepod-0 (axon), 2026-08-18,
# jax 0.9: bandwidth 674 GB/s, VPU 3.69 Tops/s f32, strided ratio 8.7x.
# Other rows scale the v5e fit by published peak ratios (remeasure with
# the tool when those targets are attached).
# ---------------------------------------------------------------------------
FITTED_COST = {
    "v5e": {"ops_per_byte": 5.5, "strided_penalty": 8.7,
            "vmem_budget": 8 * 1024 * 1024},
    "v4": {"ops_per_byte": 4.5, "strided_penalty": 8.7,
           "vmem_budget": 8 * 1024 * 1024},
    "v5p": {"ops_per_byte": 4.7, "strided_penalty": 8.7,
            "vmem_budget": 8 * 1024 * 1024},
    "v6e": {"ops_per_byte": 11.0, "strided_penalty": 8.7,
            "vmem_budget": 16 * 1024 * 1024},
    "generic": {"ops_per_byte": 5.0, "strided_penalty": 8.0,
                "vmem_budget": 8 * 1024 * 1024},
}


def fitted_cost_params(generation: str = None) -> dict:
    """Cost-model coefficients for the host (or named) generation, with
    env overrides (HT_COST_OPS_PER_BYTE / HT_COST_STRIDED_PENALTY /
    HT_COST_VMEM_BUDGET) for calibration runs."""
    gen = generation or get_host_target().generation
    p = dict(FITTED_COST.get(gen, FITTED_COST["generic"]))
    for key, env in (("ops_per_byte", "HT_COST_OPS_PER_BYTE"),
                     ("strided_penalty", "HT_COST_STRIDED_PENALTY"),
                     ("vmem_budget", "HT_COST_VMEM_BUDGET")):
        v = os.environ.get(env)
        if v:
            p[key] = float(v)
    return p


def get_target_from_environment() -> Target:
    s = os.environ.get("HL_TARGET", "host")
    return Target(s if s != "host" else None)


def get_jit_target_from_environment() -> Target:
    s = os.environ.get("HL_JIT_TARGET", os.environ.get("HL_TARGET", "host"))
    return Target(s if s != "host" else None)
