"""resnet_50 forward pass app (reference: apps/resnet_50)."""
from __future__ import annotations

import numpy as np

import halide_tpu as hl
from ..models import resnet50 as rn

from . import App, register


@register("resnet_50")
def build(layers=(3, 4, 6, 3), width: int = 64, classes: int = 1000,
          image: int = 224, batch: int = 4, **_ignored) -> App:
    p = rn.ResNetParams(tuple(layers), width, classes, image, batch)
    pipeline, params, meta = rn.build(p)

    def make_inputs(seed=0):
        return rn.random_weights(p, seed)

    def reference(**data):
        return rn.reference(p, data)

    app = App("resnet_50", pipeline, list(params.values()), make_inputs,
              reference, [classes, batch],
              megapixels=image * image * batch / 1e6,
              tolerance=5e-3, atol=1e-5)

    def ref_kw(**data):
        return rn.reference(p, data)

    app.reference = ref_kw
    return app
