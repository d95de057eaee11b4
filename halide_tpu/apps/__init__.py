"""The apps suite: the conformance + benchmark pipelines
(reference: apps/ — SURVEY.md §2.4). Each app module exposes

    build(**params) -> App    with .pipeline, .inputs, .make_inputs(),
                              .reference(numpy inputs) -> numpy golden,
                              .default_sizes / .output_sizes

and registers itself in APPS for the RunGen-style runner and bench harness.
"""
from __future__ import annotations

import importlib
from typing import Callable, Dict, List, Optional

APPS: Dict[str, Callable] = {}

_APP_MODULES = [
    "resnet_50", "linear_algebra", "fft",
    "blur", "unsharp", "gaussian_blur", "harris", "hist", "iir_blur",
    "max_filter", "interpolate", "local_laplacian", "bilateral_grid",
    "camera_pipe", "nl_means", "stencil_chain", "conv_layer",
    "depthwise_separable_conv", "lens_blur", "wavelet", "resize", "bgu",
    "compositing", "linear_blur",
]


def register(name: str):
    def deco(fn):
        APPS[name] = fn
        return fn
    return deco


def load_all() -> Dict[str, Callable]:
    for m in _APP_MODULES:
        try:
            importlib.import_module(f"halide_tpu.apps.{m}")
        except ImportError:
            pass
    return APPS


def get(name: str):
    if name not in APPS:
        load_all()
    return APPS[name]


class App:
    """One benchmarkable pipeline instance."""

    def __init__(self, name, pipeline, inputs, make_inputs, reference,
                 output_sizes, megapixels: Optional[float] = None,
                 tolerance: float = 0.0, atol: Optional[float] = None,
                 mismatch_frac: float = 0.0, flops: Optional[float] = None,
                 flops_dtype: str = "f32"):
        self.name = name
        self.pipeline = pipeline        # halide_tpu.Pipeline
        self.inputs = inputs            # list[ImageParam/Param]
        self.make_inputs = make_inputs  # () -> dict name->np array / scalar
        self.reference = reference      # (**np inputs) -> np array(s)
        self.output_sizes = output_sizes
        self.megapixels = megapixels or _mp(output_sizes)
        self.tolerance = tolerance      # rtol; 0 => bit-exact
        self.atol = atol if atol is not None else tolerance
        # fraction of pixels allowed to exceed tolerance (int-cast boundary
        # sensitivity under FMA reassociation)
        self.mismatch_frac = mismatch_frac
        # MXU accounting for the roofline/MFU bench lines: useful FLOPs per
        # frame (multiply-add = 2) and the matmul operand dtype ("bf16" is
        # a single MXU pass; "f32" at HIGHEST precision is the exact
        # 6-pass decomposition, peak/6)
        self.flops = flops
        self.flops_dtype = flops_dtype

    def bind(self, data: dict):
        from ..buffer import Buffer, ImageParam, Param
        for spec in self.inputs:
            v = data[spec.name]
            if isinstance(spec, ImageParam):
                spec.set(v)
            else:
                spec.set(v)

    def realize(self):
        return self.pipeline.realize(self.output_sizes)


def _mp(sizes) -> float:
    mp = 1.0
    for s in sizes[:2]:
        mp *= s
    return mp / 1e6
