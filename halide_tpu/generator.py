"""Generators: declarative AOT pipeline classes + registry
(reference: src/Generator.h:238-252 HALIDE_REGISTER_GENERATOR,
generate_filter_main @ Generator.cpp:663,974; driven by tools/gen.py — the
GenGen.cpp analog).

A generator is a Python class with declared GeneratorParams / inputs /
outputs and a generate() method; `execute_generator` builds it, applies CLI
param settings, and emits artifacts (serialized pipeline, AOT-exported
StableHLO executable, metadata, loop-nest / HTML reports).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from .buffer import ImageParam, Param
from .expr import CompileError
from .func import Func
from .htypes import Type
from .pipeline import Pipeline

_REGISTRY: Dict[str, type] = {}


class GeneratorParam:
    """Typed, string-settable from the build CLI (reference:
    src/Generator.h:402-672)."""

    def __init__(self, default, name: Optional[str] = None):
        self.default = default
        self.name = name

    def parse(self, s: str):
        t = type(self.default)
        if t is bool:
            return s.lower() in ("1", "true", "yes")
        if t is int:
            return int(s)
        if t is float:
            return float(s)
        if isinstance(self.default, tuple):
            return tuple(int(v) for v in s.split(","))
        return s


class Generator:
    """Base class. Subclasses declare GeneratorParam class attributes and
    implement generate(self) -> Func | Pipeline, creating inputs via
    self.input_buffer(...) / self.input_scalar(...)."""

    name: str = ""

    def __init__(self, **param_values):
        self.inputs: List = []
        self._gp: Dict[str, GeneratorParam] = {}
        for k in dir(type(self)):
            v = getattr(type(self), k)
            if isinstance(v, GeneratorParam):
                self._gp[k] = v
                setattr(self, k, param_values.get(k, v.default))
        for k, v in param_values.items():
            if k not in self._gp:
                raise CompileError(
                    f"{self.name}: unknown GeneratorParam {k!r}")

    # ---- input declaration helpers --------------------------------------
    def input_buffer(self, name: str, type: Type, dims: int) -> ImageParam:
        ip = ImageParam(type, dims, name)
        self.inputs.append(ip)
        return ip

    def input_scalar(self, name: str, type: Type, default=None) -> Param:
        p = Param(type, name, default)
        self.inputs.append(p)
        return p

    def generate(self):
        raise NotImplementedError

    def build_pipeline(self) -> Pipeline:
        out = self.generate()
        if isinstance(out, Func):
            out = Pipeline(out)
        if isinstance(out, (list, tuple)):
            out = Pipeline(list(out))
        return out


def register_generator(name: str):
    def deco(cls):
        cls.name = name
        _REGISTRY[name] = cls
        return cls
    return deco


def generator_names() -> List[str]:
    _load_app_generators()
    return sorted(_REGISTRY)


def _load_app_generators():
    """Every registered app doubles as a generator (the reference's apps are
    all generators)."""
    from .apps import APPS, load_all
    load_all()
    for name, builder in APPS.items():
        if name in _REGISTRY:
            continue

        def make_cls(builder=builder, name=name):
            class AppGenerator(Generator):
                def __init__(self, **params):
                    self._params = params
                    self.inputs = []
                    self._gp = {}

                def build_pipeline(self):
                    app = builder(**self._params)
                    self.inputs = app.inputs
                    self._app = app
                    return app.pipeline
            AppGenerator.name = name
            return AppGenerator

        _REGISTRY[name] = make_cls()


def create(name: str, **params) -> Generator:
    _load_app_generators()
    if name not in _REGISTRY:
        raise CompileError(
            f"unknown generator {name!r}; have {generator_names()}")
    return _REGISTRY[name](**params)


# ---------------------------------------------------------------------------
# artifact emission (reference: Module::compile output types, Module.h:26-47)
# ---------------------------------------------------------------------------

def emit_artifacts(gen: Generator, out_dir: str, fn_name: str,
                   emits: List[str], sizes=None) -> Dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    pipeline = gen.build_pipeline()
    written: Dict[str, str] = {}

    def path(ext):
        p = os.path.join(out_dir, f"{fn_name}.{ext}")
        return p

    if "hlpipe" in emits or "object" in emits:
        from .serialize import serialize_pipeline
        try:
            text = serialize_pipeline(pipeline)
            with open(path("hlpipe"), "w") as f:
                f.write(text)
            written["hlpipe"] = path("hlpipe")
        except CompileError as e:
            written["hlpipe_error"] = str(e)

    if "stmt" in emits:
        from .loopnest import loop_nest_str
        with open(path("stmt"), "w") as f:
            for out in pipeline.outputs:
                f.write(loop_nest_str(out) + "\n")
        written["stmt"] = path("stmt")

    if "stmt_html" in emits:
        from .report import pipeline_report_html
        with open(path("stmt.html"), "w") as f:
            f.write(pipeline_report_html(pipeline, sizes))
        written["stmt_html"] = path("stmt.html")

    if "c_header" in emits or "metadata" in emits:
        meta = {
            "name": fn_name,
            "inputs": [
                {"name": getattr(i, "name", "?"),
                 "kind": "buffer" if isinstance(i, ImageParam) else "scalar",
                 "type": repr(getattr(i, "type", None)),
                 "dims": i.dimensions() if isinstance(i, ImageParam)
                 else 0}
                for i in gen.inputs],
            "outputs": len(pipeline.outputs),
        }
        with open(path("metadata.json"), "w") as f:
            json.dump(meta, f, indent=1)
        written["metadata"] = path("metadata.json")

    if "pysource" in emits:
        # readable-source output (the CodeGen_C analog, reference:
        # src/CodeGen_C.cpp / compile_to_c): a standalone runnable .py
        # that rebuilds the pipeline from its serialized graph, plus the
        # LOWERED program as a pretty-printed jaxpr appendix
        from .serialize import serialize_pipeline
        try:
            graph_json = serialize_pipeline(pipeline)
            jaxpr_txt = ""
            if sizes is not None:
                try:
                    import jax as _jx
                    fn0, arrs0, _r0, pres0 = pipeline._prepare(
                        sizes, jit=False)
                    jaxpr_txt = str(_jx.make_jaxpr(
                        lambda a, p2: fn0(a, p2))(tuple(arrs0),
                                                  tuple(pres0)))
                except Exception as ex:
                    jaxpr_txt = f"<jaxpr unavailable: {ex}>"
            src = (
                '"""Generated by halide_tpu (-e pysource): standalone '
                f'runnable source for {fn_name!r}.\n'
                'Rebuilds the pipeline from its serialized graph and '
                'realizes it with bound inputs.\n"""\n'
                "import halide_tpu as hl\n"
                "from halide_tpu.serialize import deserialize_pipeline\n\n"
                f"GRAPH = r'''{graph_json}'''\n\n\n"
                "def pipeline():\n"
                "    return deserialize_pipeline(GRAPH)\n\n\n"
                "def run(sizes, **inputs):\n"
                "    p, imgs, params = pipeline()\n"
                "    for name, v in inputs.items():\n"
                "        (imgs.get(name) or params[name]).set(v)\n"
                "    return p.realize(sizes)\n"
                + ("\n\n# ---- lowered program (jaxpr) ----\n"
                   + "".join(f"# {ln}\n"
                             for ln in jaxpr_txt.splitlines())
                   if jaxpr_txt else ""))
            with open(path("py"), "w") as f:
                f.write(src)
            written["pysource"] = path("py")
        except Exception as e:
            written["pysource_error"] = str(e)

    if "object" in emits:
        # AOT executable: jax.export'd StableHLO of the whole pipeline at
        # the given sizes (the analog of the compiled object + registration)
        if sizes is None:
            raise CompileError("-e object needs explicit sizes=WxH[xC...]")
        try:
            blob = export_compiled(pipeline, sizes)
            with open(path("exported"), "wb") as f:
                f.write(blob)
            written["object"] = path("exported")
        except Exception as e:   # export support varies by backend
            written["object_error"] = str(e)
    return written


def export_compiled(pipeline: Pipeline, sizes) -> bytes:
    """Serialize the jitted executor via jax.export (StableHLO). Re-loadable
    with load_compiled(); the artifact embeds shapes/dtypes."""
    import jax
    from jax import export as jexport

    fn, input_arrays, _regions, presets = pipeline._prepare(sizes)
    args = tuple(input_arrays)
    exp = jexport.export(fn)(
        tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args),
        tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in presets))
    return exp.serialize()


def load_compiled(blob: bytes):
    from jax import export as jexport
    exp = jexport.deserialize(blob)
    return exp.call
