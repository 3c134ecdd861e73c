"""sympy → JAX lowering.

This replaces the reference's C transpiler + zig-cc + dlopen pipeline
(compiler.py:279-650 → dylib.rs): model expressions are printed to Python
source over ``jax.numpy`` and compiled with ``exec``; XLA is the native
compiler and the TPU the native target.

The symbol-indexing contract matches the reference exactly (see
:mod:`inflatox_tpu.lowering.registry`): field symbols read ``x[i]``, tangent
symbols ``xdot[i]``, parameters ``args[i]``.  Lowered functions are
shape-polymorphic: ``x``/``xdot``/``args`` may be 1-D arrays (point
evaluation) or sequences of broadcastable arrays (grid evaluation) — all
generated operations are elementwise, so no ``vmap`` is needed for grids.

Divergences from the reference, by design:

* integer powers are lowered to integer exponents (XLA ``integer_pow``),
  preserving C ``pow``'s correct handling of negative bases with integral
  exponents — a float-exponent lowering would return NaN there;
* special functions target :mod:`inflatox_tpu.lowering.special` instead of
  GSL, with the same family coverage (compiler.py:123-212) and the same
  "Cannot compute hypergeometric functions other than 2F0, 2F1, 1F1 and 0F1"
  rejection.
"""

from __future__ import annotations

import re
import sys
from dataclasses import dataclass, field
from typing import Callable, Sequence

import jax
import sympy
from sympy.printing.numpy import JaxPrinter

from ..utils.errors import MissingSymbolError
from . import accmath, special
from .registry import SymbolRegistry

__all__ = ["LoweredFunction", "lower", "MaxCsesExceeded"]


class MaxCsesExceeded(Exception):
    """Raised when sympy CSE produces more subexpressions than ``max_cses``
    (reference compiler.py:394: "Maximum number of common subexpressions
    reached!")."""


class _ModelJaxPrinter(JaxPrinter):
    """JaxPrinter wired to the x/xdot/args symbol contract."""

    def __init__(self, registry: SymbolRegistry, settings=None):
        super().__init__(settings)
        self._registry = registry

    # -- symbols ------------------------------------------------------------ #

    def _print_Symbol(self, expr):
        slot = self._registry.slot(expr)
        if slot is not None:
            kind, i = slot
            return f"{kind}[{i}]"
        name = str(expr)
        if name.startswith("cse"):
            return name  # CSE local variable
        raise MissingSymbolError(name, "<SymbolRegistry>")

    # -- wide sums/products ------------------------------------------------- #
    # Python's default printing of an N-term Add/Mul produces a left-nested
    # chain of depth N; evaluating that under jax tracing exceeds CPython
    # 3.12's *fixed* C recursion limit for EGNO/D5-class expressions (and
    # sys.setrecursionlimit cannot raise it).  Balanced grouping makes the
    # depth log N.  Evaluation-order rounding changes are ~1 ulp — within
    # every parity tolerance (docs/numerics.md).

    _BALANCE_THRESHOLD = 16

    def _print_balanced(self, args, op):
        if len(args) == 1:
            return self._print(args[0])
        mid = len(args) // 2
        left = self._print_balanced(args[:mid], op)
        right = self._print_balanced(args[mid:], op)
        return f"({left} {op} {right})"

    def _print_Add(self, expr, order=None):
        if len(expr.args) <= self._BALANCE_THRESHOLD:
            return super()._print_Add(expr, order)
        return self._print_balanced(expr.args, "+")

    def _print_Mul(self, expr):
        if len(expr.args) <= self._BALANCE_THRESHOLD:
            return super()._print_Mul(expr)
        return self._print_balanced(expr.args, "*")

    # -- powers ------------------------------------------------------------- #

    def _print_Pow(self, expr):
        base, exponent = expr.base, expr.exp
        if exponent.is_Integer:
            return f"({self._print(base)})**({int(exponent)})"
        if exponent.is_Number and not exponent.free_symbols:
            # float exponent with integral value: C pow() handles negative
            # bases correctly for these; jnp.power would NaN — use int power
            f = float(exponent)
            if f == int(f):
                return f"({self._print(base)})**({int(f)})"
        if exponent == sympy.Rational(1, 2):
            return f"jax.numpy.sqrt({self._print(base)})"
        if exponent == sympy.Rational(-1, 2):
            return f"(1.0/jax.numpy.sqrt({self._print(base)}))"
        # general float power: accurate software pow (native XLA f64 pow is
        # only ~4e-8 on these backends — see lowering.accmath)
        return f"_amath.pow({self._print(base)}, {self._print(exponent)})"

    # -- weak-libm transcendentals → accurate implementations ---------------- #
    # (XLA f64 exp/atan/sinh/cosh/tanh/acos are ~1e-8 on CPU and TPU; the
    # replacements in lowering.accmath are ~1e-13 — required for the ≤1e-10
    # reference-parity budget)

    def _print_exp(self, expr):
        return f"_amath.exp({self._print(expr.args[0])})"

    def _print_atan(self, expr):
        return f"_amath.atan({self._print(expr.args[0])})"

    def _print_sinh(self, expr):
        return f"_amath.sinh({self._print(expr.args[0])})"

    def _print_cosh(self, expr):
        return f"_amath.cosh({self._print(expr.args[0])})"

    def _print_tanh(self, expr):
        return f"_amath.tanh({self._print(expr.args[0])})"

    def _print_acos(self, expr):
        return f"_amath.acos({self._print(expr.args[0])})"

    # the sympy base printer renders these to scalar-only math.* calls
    # (NameError/TypeError on arrays) — route to the accurate array forms
    def _print_erf(self, expr):
        return f"_amath.erf({self._print(expr.args[0])})"

    def _print_erfc(self, expr):
        return f"_amath.erfc({self._print(expr.args[0])})"

    def _print_loggamma(self, expr):
        return f"_amath.lgamma({self._print(expr.args[0])})"

    def _print_gamma(self, expr):
        return f"_amath.gamma({self._print(expr.args[0])})"

    def _print_polygamma(self, expr):
        n, z = expr.args
        if not (n.is_Integer and int(n) >= 0):
            raise NotImplementedError(
                f"polygamma order must be a non-negative integer, got {n}"
            )
        return f"_amath.polygamma({int(n)}, {self._print(z)})"

    # the base printer renders Max/Min through functools.reduce, which the
    # lowered namespace does not carry — emit nested jnp calls instead
    def _print_Max(self, expr):
        args = [self._print(a) for a in expr.args]
        out = args[-1]
        for a in reversed(args[:-1]):
            out = f"jax.numpy.maximum({a}, {out})"
        return out

    def _print_Min(self, expr):
        args = [self._print(a) for a in expr.args]
        out = args[-1]
        for a in reversed(args[:-1]):
            out = f"jax.numpy.minimum({a}, {out})"
        return out

    # -- special functions → _special.* ------------------------------------- #

    def _print_besselj(self, expr):
        nu, z = expr.args
        return f"_special.besselj({self._print(nu)}, {self._print(z)})"

    def _print_bessely(self, expr):
        nu, z = expr.args
        return f"_special.bessely({self._print(nu)}, {self._print(z)})"

    def _print_besseli(self, expr):
        nu, z = expr.args
        return f"_special.besseli({self._print(nu)}, {self._print(z)})"

    def _print_besselk(self, expr):
        nu, z = expr.args
        return f"_special.besselk({self._print(nu)}, {self._print(z)})"

    def _print_jn(self, expr):
        n, z = expr.args
        return f"_special.sph_jn({self._print(n)}, {self._print(z)})"

    def _print_yn(self, expr):
        n, z = expr.args
        return f"_special.sph_yn({self._print(n)}, {self._print(z)})"

    def _print_hyper(self, expr):
        """Same family coverage as the reference's GSL printer
        (compiler.py:158-177)."""
        ap, bq, z = expr.args
        kind = (len(ap), len(bq))
        a = [self._print(v) for v in ap]
        b = [self._print(v) for v in bq]
        zs = self._print(z)
        if kind == (2, 0):
            return f"_special.hyp2f0({a[0]}, {a[1]}, {zs})"
        if kind == (2, 1):
            return f"_special.hyp2f1({a[0]}, {a[1]}, {b[0]}, {zs})"
        if kind == (1, 1):
            return f"_special.hyp1f1({a[0]}, {b[0]}, {zs})"
        if kind == (0, 1):
            return f"_special.hyp0f1({b[0]}, {zs})"
        raise Exception(
            "Cannot compute hypergeometric functions other than 2F0, 2F1, "
            "1F1 and 0F1"
        )


#: special-function heads hoisted by the always-on special-call CSE
_SPECIAL_HEADS = (
    sympy.besselj,
    sympy.bessely,
    sympy.besseli,
    sympy.besselk,
    sympy.functions.special.bessel.jn,
    sympy.functions.special.bessel.yn,
    sympy.hyper,
)


def _bounded_cse_symbols(max_cses: int):
    """Generator of cse0, cse1, ... capped at ``max_cses``
    (reference compiler.py:384-396)."""
    num = 0
    while num <= max_cses:
        yield sympy.Symbol(f"cse{num}")
        num += 1
    raise MaxCsesExceeded("Maximum number of common subexpressions reached!")


@dataclass(eq=False)  # identity hash/eq so jax.jit can cache on the instance
class LoweredFunction:
    """A model expression (or tuple of expressions) lowered to a JAX callable.

    ``fn`` takes the positional arguments named in ``signature`` (subset of
    ``("x", "xdot", "args")``), each an indexable of scalars or of
    mutually-broadcastable arrays, and returns a scalar (``n_outputs == 1``)
    or a tuple."""

    fn: Callable
    signature: tuple
    source: str
    n_outputs: int
    name: str = "_lowered"

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)


def lower(
    exprs,
    registry: SymbolRegistry,
    signature: Sequence[str] = ("x", "args"),
    cse: bool = False,
    max_cses: int = 1000,
    name: str = "_lowered",
) -> LoweredFunction:
    """Lower one sympy expression (or a list) to a JAX callable.

    Args
    ----
    exprs: a sympy expression or list of expressions (evaluated together, so
        CSE can share work across outputs — like the reference's vector
        functions, compiler.py:417-443).
    registry: the model's symbol registry (fixed slot assignment).
    signature: which argument arrays the function takes, in order.
    cse: run sympy common-subexpression elimination before printing.  XLA
        performs CSE anyway; this flag mainly bounds *expression-tree size*
        (important for sympy trees with massive duplication, e.g. the
        D5-brane model) and mirrors the reference's ``cse`` compiler flag.
    max_cses: cap on CSE symbol count (reference compiler.py:354-356).
    name: function name used in the generated source (for tracebacks).
    """
    single = not isinstance(exprs, (list, tuple))
    expr_list = [sympy.sympify(exprs)] if single else [sympy.sympify(e) for e in exprs]

    printer = _ModelJaxPrinter(registry)
    lines = []

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100_000))
    try:
        # always-on special-call CSE: every distinct special-function call
        # (function, order, argument expression) is hoisted into ONE local
        # assignment, innermost-first, regardless of the cse flag.  On the
        # compensated Pallas engines a single fractional-order Bessel call
        # unrolls a Miller/CF2 chain of thousands of ops — duplicate prints
        # of the same call multiply Mosaic compile time catastrophically
        # (the trace-scoped memo in df32_special dedups only calls that
        # share argument *tracers*, which re-emitted source never does).
        sf_map: dict = {}

        def _hoist(e):
            insts = e.atoms(*_SPECIAL_HEADS)
            if not insts and not sf_map:
                return e
            for inst in sorted(
                insts,
                key=lambda i: (sympy.count_ops(i),
                               sympy.default_sort_key(i)),
            ):
                if inst not in sf_map:
                    rewritten = inst.xreplace(sf_map) if sf_map else inst
                    sym = sympy.Symbol(f"cse_sf{len(sf_map)}")
                    lines.append(
                        f"    {sym} = {printer.doprint(rewritten)}"
                    )
                    sf_map[inst] = sym
            return e.xreplace(sf_map) if sf_map else e

        if cse:
            pairs, reduced = sympy.cse(
                expr_list,
                symbols=_bounded_cse_symbols(max_cses),
                order="none",
                list=True,
            )
            for sym, definition in pairs:
                lines.append(f"    {sym} = {printer.doprint(_hoist(definition))}")
            expr_list = list(reduced)
        printed = [printer.doprint(_hoist(e)) for e in expr_list]
    finally:
        sys.setrecursionlimit(old_limit)

    if single:
        ret = printed[0]
    else:
        ret = "(" + ", ".join(printed) + ("," if len(printed) == 1 else "") + ")"

    src = (
        f"def {name}({', '.join(signature)}):\n"
        + ("\n".join(lines) + "\n" if lines else "")
        + f"    return {ret}\n"
    )
    # the sympy base printer can fall back to scalar math.* / functools.*
    # for functions without an override above — those would NameError at
    # call time (the exec namespace carries only jax/_special/_amath).
    # Fail at lower time with an actionable message instead.
    leak = re.search(r"(?<![\w.])(math|functools)\.(\w+)", src)
    if leak:
        raise NotImplementedError(
            f"'{leak.group(2)}' has no array lowering (the printer fell "
            f"back to scalar {leak.group(1)}.{leak.group(2)}); add a "
            "_print_ override in lowering/jax_lowering.py"
        )
    namespace = {"jax": jax, "_special": special, "_amath": accmath}
    exec(compile(src, f"<inflatox-lowered:{name}>", "exec"), namespace)
    return LoweredFunction(
        fn=namespace[name],
        signature=tuple(signature),
        source=src,
        n_outputs=len(expr_list),
        name=name,
    )
