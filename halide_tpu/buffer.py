"""Buffers and pipeline parameters.

`Buffer` is the data-exchange object, the analog of halide_buffer_t + the C++
Halide::Runtime::Buffer (reference: src/runtime/HalideRuntime.h:1695,
src/runtime/HalideBuffer.h:222). Key semantics preserved:

- dimension i of the pipeline coordinate space maps to numpy axis (ndim-1-i),
  i.e. dim 0 (x) is the contiguous minor axis — exactly the reference's
  numpy interop convention, and also the TPU lane dimension.
- every dimension carries a *min* coordinate (buffers over shifted domains,
  reference Appendix: halide_dimension_t.min; tutorial/lesson_06).

The device array itself is a jax.Array; Buffer is a thin coordinate-space shim.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from . import expr as E
from .expr import Call, CompileError, Expr, to_expr
from .htypes import Type, type_of

__all__ = ["Buffer", "ImageParam", "Param", "Realization"]


class _Dim:
    __slots__ = ("min", "extent")

    def __init__(self, mn: int, extent: int):
        self.min = mn
        self.extent = extent

    def max(self) -> int:
        return self.min + self.extent - 1


class _CallableMixin:
    """Shared by Buffer/ImageParam: calling with index exprs builds a Call."""

    def __call__(self, *args) -> Expr:
        from .func import _resolve_implicit
        args = _resolve_implicit(self, args)
        if len(args) != self.dimensions():
            raise CompileError(
                f"{self.name} has {self.dimensions()} dims, called with "
                f"{len(args)} args")
        args = tuple(to_expr(a) for a in args)
        for a in args:
            if not a.dtype.is_integer():
                raise CompileError(f"{self.name} index must be integer: {a}")
        return Call(self, args)

    def __getitem__(self, args) -> Expr:
        if not isinstance(args, tuple):
            args = (args,)
        return self(*args)

    def output_type(self, value_index: int = 0) -> Type:
        assert value_index == 0
        return self.type


class Buffer(_CallableMixin):
    def __init__(self, data=None, type: Optional[Type] = None,
                 sizes: Optional[Sequence[int]] = None,
                 mins: Optional[Sequence[int]] = None, name: Optional[str] = None):
        import jax.numpy as jnp
        if data is None:
            assert type is not None and sizes is not None
            data = jnp.zeros(tuple(reversed([int(s) for s in sizes])),
                             dtype=type.to_np())
        self._data = data
        self.type = type if type is not None else type_of(data.dtype)
        nd = data.ndim
        self._mins = tuple(mins) if mins is not None else (0,) * nd
        self.name = name or "buf"

    # ---- metadata --------------------------------------------------------
    def dimensions(self) -> int:
        return self._data.ndim

    def dim(self, i: int) -> _Dim:
        return _Dim(self._mins[i], self._data.shape[self._data.ndim - 1 - i])

    def width(self) -> int:
        return self.dim(0).extent

    def height(self) -> int:
        return self.dim(1).extent

    def channels(self) -> int:
        return self.dim(2).extent

    def set_min(self, *mins: int) -> "Buffer":
        self._mins = tuple(mins) + self._mins[len(mins):]
        return self

    # ---- data access -------------------------------------------------------
    @property
    def data(self):
        return self._data

    def to_numpy(self) -> np.ndarray:
        """numpy array in numpy axis order (reversed pipeline dims)."""
        return np.asarray(self._data)

    def __array__(self, dtype=None):
        a = self.to_numpy()
        return a.astype(dtype) if dtype is not None else a

    def at(self, *coords):
        """Read one element at pipeline coordinates (x, y, ...)."""
        idx = tuple(int(c) - m for c, m in zip(coords, self._mins))
        return self._data[tuple(reversed(idx))]

    def copy(self) -> "Buffer":
        return Buffer(self._data, self.type, mins=self._mins, name=self.name)

    def __repr__(self):
        dims = "x".join(str(self.dim(i).extent) for i in range(self.dimensions()))
        return f"Buffer<{self.type.short_name()}>({self.name}, {dims})"


class ImageParam(_CallableMixin):
    """Symbolic image input (reference: src/ImageParam.h)."""

    _counter = [0]

    def __init__(self, type: Type, dims: int, name: Optional[str] = None):
        if name is None:
            ImageParam._counter[0] += 1
            name = f"img{ImageParam._counter[0]}"
        self.type = type
        self._dims = dims
        self.name = name
        self._bound: Optional[Buffer] = None
        # optional per-dim constraints (reference dim().set_bounds / estimates)
        self.estimates: dict = {}

    def dimensions(self) -> int:
        return self._dims

    def set(self, b) -> None:
        if not isinstance(b, Buffer):
            b = Buffer(b)
        if b.dimensions() != self._dims:
            raise CompileError(
                f"ImageParam {self.name} is {self._dims}-D; buffer is "
                f"{b.dimensions()}-D")
        self._bound = b

    def get(self) -> Buffer:
        if self._bound is None:
            raise CompileError(f"ImageParam {self.name} is unbound")
        return self._bound

    def reset(self) -> None:
        self._bound = None

    def set_estimates(self, ranges) -> "ImageParam":
        self.estimates = {i: (to_expr(mn), to_expr(ex))
                          for i, (mn, ex) in enumerate(ranges)}
        return self

    def dim(self, i: int) -> "_ParamDim":
        return _ParamDim(self, i)

    def width(self) -> Expr:
        return self.dim(0).extent()

    def height(self) -> Expr:
        return self.dim(1).extent()

    def channels(self) -> Expr:
        return self.dim(2).extent()

    def in_(self, consumer=None):
        from .func import Func
        f = Func(f"{self.name}_im")
        from .func import Var
        vs = [Var(f"_{self.name}_{i}") for i in range(self._dims)]
        f[tuple(vs)] = self(*vs)
        return f


class _ParamDim:
    """Symbolic min/extent of an ImageParam dimension, resolved at realize time."""

    def __init__(self, img: ImageParam, i: int):
        self.img = img
        self.i = i

    def min(self) -> Expr:
        return E.Intrin("buffer_min", E.Int(32), (self.img, self.i))

    def extent(self) -> Expr:
        return E.Intrin("buffer_extent", E.Int(32), (self.img, self.i))

    def max(self) -> Expr:
        return self.min() + self.extent() - 1

    def set_estimate(self, mn, ex) -> "_ParamDim":
        self.img.estimates[self.i] = (to_expr(mn), to_expr(ex))
        return self


class Param:
    """Scalar pipeline parameter (reference: src/Param.h)."""

    _counter = [0]

    def __init__(self, type: Type, name: Optional[str] = None, default=None):
        if isinstance(type, str) and name is None:
            raise CompileError("Param(type, name)")
        if name is None:
            Param._counter[0] += 1
            name = f"param{Param._counter[0]}"
        self.type = type
        self.name = name
        self._value = default
        self._estimate = None

    def set(self, v) -> None:
        self._value = v

    def get(self):
        if self._value is None:
            raise CompileError(f"Param {self.name} is unset")
        return self._value

    def set_estimate(self, v) -> None:
        self._estimate = v

    def _to_expr(self) -> Expr:
        return E.Intrin("param", self.type, (self,))

    # arithmetic sugar: params act like exprs
    def __add__(self, o):
        return self._to_expr() + o

    def __radd__(self, o):
        return o + self._to_expr()

    def __sub__(self, o):
        return self._to_expr() - o

    def __rsub__(self, o):
        return o - self._to_expr()

    def __mul__(self, o):
        return self._to_expr() * o

    def __rmul__(self, o):
        return o * self._to_expr()

    def __truediv__(self, o):
        return self._to_expr() / o

    def __rtruediv__(self, o):
        return o / self._to_expr()

    def __neg__(self):
        return -self._to_expr()

    def __mod__(self, o):
        return self._to_expr() % o

    def __rmod__(self, o):
        return o % self._to_expr()

    # comparisons build Exprs, like the reference's Param<T> operators
    def __lt__(self, o):
        return self._to_expr() < o

    def __le__(self, o):
        return self._to_expr() <= o

    def __gt__(self, o):
        return self._to_expr() > o

    def __ge__(self, o):
        return self._to_expr() >= o


class Realization(list):
    """Tuple-valued realize result: a list of Buffers."""

    def __init__(self, bufs):
        super().__init__(bufs)
