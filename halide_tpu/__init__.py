"""halide_tpu — a TPU-native rebuild of the Halide image/array-processing DSL.

Algorithm/schedule split on JAX/XLA/Pallas: Funcs trace to a pure pipeline
graph; default lowering evaluates stages as fused XLA array programs; schedule
directives (tile/compute_at/vectorize/...) steer a Pallas lowering that stages
producers through VMEM exactly where the reference would stage them in cache.

See SURVEY.md for the map from the reference (halide/Halide) to this design.
"""
import sys as _sys

# deep pipelines (stencil_chain at 32 stages, resnet) recurse through the
# expression DAG; the reference's analog is HL_COMPILER_STACK_SIZE
# (reference: src/Util.h run_with_large_stack)
if _sys.getrecursionlimit() < 100000:
    _sys.setrecursionlimit(100000)

import jax as _jax

# the reference's type lattice includes 64-bit ints and doubles; everything in
# this package is explicitly dtyped, so enabling x64 does not change defaults
# for dtype-annotated code paths.
_jax.config.update("jax_enable_x64", True)

# deep pyramid towers (local_laplacian at 8 levels) recurse past python's
# default 1000 frames during expr walks/eval; compilers conventionally
# raise the limit
_sys.setrecursionlimit(max(_sys.getrecursionlimit(), 20000))

from .htypes import (Type, Int, UInt, Float, BFloat, Bool, Handle)  # noqa: E402
from .expr import (Expr, CompileError, HalideError)                 # noqa: E402
from . import expr as _expr_mod                                     # noqa: E402
from .func import Var, Func, Stage, FuncRef, _, TupleExpr as Tuple  # noqa: E402
from .rdom import RDom, RVar                                        # noqa: E402
from .buffer import Buffer, ImageParam, Param, Realization          # noqa: E402
from .pipeline import Pipeline                                      # noqa: E402
from .schedule import (TailStrategy, LoopLevel, ForType,            # noqa: E402
                       LoopAlignStrategy)
from .target import (Target, get_host_target,                       # noqa: E402
                     get_jit_target_from_environment,
                     get_target_from_environment)
from .iroperator import *                                           # noqa: E402,F401,F403
from .iroperator import __all__ as _irop_all                        # noqa: E402
from .inline_reductions import (sum, product, maximum, minimum,     # noqa: E402
                                argmax, argmin)
from .boundary import (repeat_edge, constant_exterior, repeat_image,  # noqa: E402
                       mirror_image, mirror_interior)
from . import boundary as BoundaryConditions                        # noqa: E402
from .hooks import set_custom_print, set_error_handler              # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Type", "Int", "UInt", "Float", "BFloat", "Bool", "Handle",
    "Expr", "CompileError", "HalideError",
    "Var", "Func", "Stage", "FuncRef", "_", "Tuple",
    "RDom", "RVar",
    "Buffer", "ImageParam", "Param", "Realization",
    "Pipeline", "TailStrategy", "LoopLevel", "ForType",
    "LoopAlignStrategy",
    "Target", "get_host_target", "get_jit_target_from_environment",
    "get_target_from_environment",
    "sum", "product", "maximum", "minimum", "argmax", "argmin",
    "repeat_edge", "constant_exterior", "repeat_image", "mirror_image",
    "mirror_interior", "BoundaryConditions",
] + list(_irop_all)

from .serialize import serialize_pipeline, deserialize_pipeline  # noqa: E402
__all__ += ["serialize_pipeline", "deserialize_pipeline"]
from .derivative import propagate_adjoints  # noqa: E402
__all__ += ["propagate_adjoints"]
