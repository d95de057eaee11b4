"""Scalar type system.

Mirrors the reference's Type lattice (reference: src/Type.h:296-332): int/uint
{8,16,32,64}, float {16,32,64}, bfloat16, bool, handle. Vector lanes are NOT part
of the type here — vectorization is implicit in the array programming model (the
VPU consumes whole tiles), so types are scalar element types only.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "Type", "Int", "UInt", "Float", "BFloat", "Bool", "Handle",
    "type_of", "match_types",
]


@dataclasses.dataclass(frozen=True)
class Type:
    code: str   # 'int' | 'uint' | 'float' | 'bfloat' | 'handle'
    bits: int

    # ---- classification ------------------------------------------------
    def is_int(self) -> bool:
        return self.code == "int"

    def is_uint(self) -> bool:
        return self.code == "uint"

    def is_integer(self) -> bool:
        return self.code in ("int", "uint")

    def is_float(self) -> bool:
        return self.code in ("float", "bfloat")

    def is_bool(self) -> bool:
        return self.code == "uint" and self.bits == 1

    def is_handle(self) -> bool:
        return self.code == "handle"

    # ---- numpy/jnp interop ---------------------------------------------
    def to_np(self):
        if self.is_bool():
            return np.dtype(np.bool_)
        if self.code == "int":
            return np.dtype(f"int{self.bits}")
        if self.code == "uint":
            return np.dtype(f"uint{self.bits}")
        if self.code == "float":
            return np.dtype(f"float{self.bits}")
        if self.code == "bfloat":
            import ml_dtypes
            return np.dtype(ml_dtypes.bfloat16)
        raise ValueError(f"no numpy dtype for {self}")

    # ---- ranges ----------------------------------------------------------
    def min_value(self):
        if self.is_bool():
            return False
        if self.code == "uint":
            return 0
        if self.code == "int":
            return -(1 << (self.bits - 1))
        return -np.inf

    def max_value(self):
        if self.is_bool():
            return True
        if self.code == "uint":
            return (1 << self.bits) - 1
        if self.code == "int":
            return (1 << (self.bits - 1)) - 1
        return np.inf

    def can_represent(self, v) -> bool:
        if self.is_float():
            return True
        if isinstance(v, float) and not float(v).is_integer():
            return False
        return self.min_value() <= v <= self.max_value()

    def __repr__(self):
        if self.is_bool():
            return "Bool()"
        return f"{self.code}{self.bits}"

    def short_name(self) -> str:
        if self.is_bool():
            return "b1"
        c = {"int": "i", "uint": "u", "float": "f", "bfloat": "bf"}[self.code]
        return f"{c}{self.bits}"


def Int(bits: int = 32) -> Type:
    return Type("int", bits)


def UInt(bits: int = 32) -> Type:
    return Type("uint", bits)


def Float(bits: int = 32) -> Type:
    return Type("float", bits)


def BFloat(bits: int = 16) -> Type:
    return Type("bfloat", bits)


def Bool() -> Type:
    return Type("uint", 1)


def Handle() -> Type:
    return Type("handle", 64)


_NP_TO_TYPE = None


def type_of(np_dtype) -> Type:
    """Map a numpy/jnp dtype to a framework Type."""
    global _NP_TO_TYPE
    if _NP_TO_TYPE is None:
        import ml_dtypes
        _NP_TO_TYPE = {
            np.dtype(np.bool_): Bool(),
            np.dtype(ml_dtypes.bfloat16): BFloat(16),
        }
        for b in (8, 16, 32, 64):
            _NP_TO_TYPE[np.dtype(f"int{b}")] = Int(b)
            _NP_TO_TYPE[np.dtype(f"uint{b}")] = UInt(b)
        for b in (16, 32, 64):
            _NP_TO_TYPE[np.dtype(f"float{b}")] = Float(b)
    return _NP_TO_TYPE[np.dtype(np_dtype)]


def match_types(ta: Type, tb: Type) -> Type:
    """Binary-operator type unification.

    Follows the reference's match_types rules (reference: src/IROperator.cpp
    match_types): floats win and take the wider float; mixed-signedness integers
    become signed at the wider width; bools promote to the other side.
    """
    if ta == tb:
        return ta
    if ta.is_handle() or tb.is_handle():
        raise TypeError("arithmetic on handle types")
    if ta.is_bool():
        return tb
    if tb.is_bool():
        return ta
    a_f, b_f = ta.is_float(), tb.is_float()
    if a_f and b_f:
        # bfloat16 + float16 -> float32; otherwise wider wins
        if ta.code != tb.code:
            if ta.bits == tb.bits:
                return Float(2 * ta.bits)
            return ta if ta.bits > tb.bits else tb
        return ta if ta.bits >= tb.bits else tb
    if a_f:
        return ta
    if b_f:
        return tb
    bits = max(ta.bits, tb.bits)
    if ta.code == tb.code:
        return Type(ta.code, bits)
    return Int(bits)
