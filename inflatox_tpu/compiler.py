"""Compiler: lower an :class:`InflationModel` to a bundle of JAX callables.

Reference parity map:

* ``Compiler`` (reference compiler.py:279-650) — same constructor surface;
  instead of generating C and invoking ``zig cc``, :meth:`Compiler.compile`
  lowers every model expression to JAX (see :mod:`inflatox_tpu.lowering`).
* ``CompilationArtifact`` (reference compiler.py:215-276) —
  :class:`CompiledModel` keeps the same user-facing contract
  (``symbol_dictionary``, ``n_fields``, ``n_parameters``, ``lookup_symbol``,
  ``print_sym_lookup_table``) plus the callables themselves.
* dylib symbol table (dylib.rs:32-42) — every C symbol has a callable
  equivalent here: ``V`` → :attr:`CompiledModel.potential`, ``v{a}{b}`` →
  :meth:`CompiledModel.hesse`, ``v``/``w{n}`` → :meth:`CompiledModel.basis`,
  ``inner_prod`` → :meth:`CompiledModel.inner_prod`, ``grad_norm_squared`` →
  :attr:`CompiledModel.grad_square`, ``eom{a}``/``eomh``/``eomhdot`` →
  :attr:`CompiledModel.eom` / :attr:`eom_h` / :attr:`eom_hdot`.  The ABI
  version handshake (dylib.rs:78-92) becomes a schema-version check on
  serialized bundles.

Beyond the reference ABI, the bundle also exposes the *raw* potential
gradient ``grad`` (∂_a V, no metric) — used by ``flag_quantum_dif`` to
implement its documented intent (see conditions.py).

Compile-once / scan-many: :meth:`CompiledModel.save` writes a JSON bundle of
``sympy.srepr`` strings; :meth:`CompiledModel.load` re-lowers it in
milliseconds — the heavy symbolic stage is skipped entirely.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import jax.numpy as jnp
import sympy

from .lowering import SymbolRegistry, lower
from .symbolic import InflationModel
from .utils.errors import SchemaVersionError
from .utils.logging import log_info
from .version import __schema_version__, schema_compatible

__all__ = ["Compiler", "CompiledModel", "CompilationArtifact"]


class CompiledModel:
    """A model lowered to JAX callables — the TPU-native "compilation artifact".

    All callables are pure and shape-polymorphic: ``x``/``xdot``/``args`` may
    be 1-D arrays for point evaluation or sequences of broadcastable arrays
    for grid evaluation (each coordinate a full grid array).  Wrap calls in
    ``jax.jit`` at the use site; the condition/solver layers already do.
    """

    def __init__(
        self,
        model: InflationModel,
        registry: SymbolRegistry,
        *,
        cse: bool = False,
        max_cses: int = 1000,
        silent: bool = True,
    ):
        self._model = model
        self._registry = registry
        self._cse_opts = {"cse": cse, "max_cses": max_cses}
        self._df32_fns = None
        self.model_name = model.model_name
        self.n_fields = model.dim
        self.n_parameters = registry.n_parameters
        self.symbol_dictionary = registry.symbol_dictionary

        d = model.dim
        lo = lambda exprs, sig, name: lower(  # noqa: E731
            exprs, registry, signature=sig, name=name, **self._cse_opts
        )

        if not silent:
            log_info(f'Lowering model "{model.model_name}" to JAX...')

        # scalar functions over (x, args)
        self.potential = lo(model.potential, ("x", "args"), "potential")
        self.grad_square = lo(model.gradient_square, ("x", "args"), "grad_square")

        # raw gradient ∂_a V (not part of the reference ABI; see module docs)
        raw_grad = [sympy.diff(model.potential, f) for f in model.coordinates]
        self._grad = lo(raw_grad, ("x", "args"), "grad")

        # projected Hesse: all d² components in one lowered function so CSE
        # (sympy-level and XLA-level) is shared — replaces v{a}{b} symbols
        flat_hesse = [model.hesse_cmp[a][b] for a in range(d) for b in range(d)]
        self._hesse = lo(flat_hesse, ("x", "args"), "hesse")

        # vielbein basis: d vectors × d components, flattened row-major
        flat_basis = [c for vec in model.basis for c in vec]
        self._basis = lo(flat_basis, ("x", "args"), "basis")

        # metric (for inner products); zero entries elided at lowering time
        # like the reference's inner_prod codegen (compiler.py:459-469)
        self._metric_nonzero = [
            (a, b)
            for a in range(d)
            for b in range(d)
            if sympy.sympify(model.metric[a][b]) != 0
        ]
        nonzero_exprs = [model.metric[a][b] for a, b in self._metric_nonzero]
        self._metric = lo(nonzero_exprs or [sympy.Integer(0)], ("x", "args"), "metric")

        # equations of motion
        self.eom = lo(list(model.eom_fields), ("x", "xdot", "args"), "eom")
        self.eom_h = lo(model.eom_h, ("x", "xdot", "args"), "eom_h")
        self.eom_hdot = lo(model.eom_hdot, ("x", "xdot", "args"), "eom_hdot")

        if not silent:
            log_info(
                f"Lowered {2 + 1 + d * d + d * d + len(nonzero_exprs) + d + 2} "
                f"expressions ({self.n_parameters} parameters)."
            )

    # ------------------------------------------------------------------ #
    # structured evaluation helpers                                      #
    # ------------------------------------------------------------------ #

    def hesse(self, x, args):
        """Projected Hesse matrix, stacked to shape (d, d[, *grid])."""
        d = self.n_fields
        flat = self._hesse(x, args)
        return jnp.stack([jnp.stack(flat[a * d : (a + 1) * d]) for a in range(d)])

    def hesse_tuple(self, x, args):
        """Projected Hesse components as a flat row-major tuple (no stack —
        cheaper inside fused kernels)."""
        return self._hesse(x, args)

    def basis(self, x, args):
        """Vielbein basis, shape (d, d[, *grid]): ``basis[0]`` = v (normalized
        gradient), ``basis[i>0]`` = w_i.  Matches dylib basis fns v/w{n}."""
        d = self.n_fields
        flat = self._basis(x, args)
        return jnp.stack([jnp.stack(flat[a * d : (a + 1) * d]) for a in range(d)])

    def basis_tuple(self, x, args):
        return self._basis(x, args)

    def grad(self, x, args):
        """Raw potential gradient ∂_a V, shape (d[, *grid])."""
        return jnp.stack(self._grad(x, args))

    def inner_prod(self, x, args, v1, v2):
        """G_ab(x) v1^a v2^b — zero metric entries elided at compile time."""
        g = self._metric(x, args)
        total = 0.0
        for k, (a, b) in enumerate(self._metric_nonzero):
            total = total + g[k] * v1[a] * v2[b]
        return total

    def metric(self, x, args):
        """Metric tensor G_ab(x), shape (d, d[, *grid])."""
        d = self.n_fields
        g = self._metric(x, args)
        vals = [jnp.asarray(v) for v in (g if isinstance(g, tuple) else (g,))]
        # entries lower independently: a constant entry (e.g. G_00 = 1)
        # comes back scalar while an x-dependent one rides the grid shape —
        # broadcast everything to the x arrays' common shape before
        # stacking (a fully-constant metric must still honor the
        # trailing-grid-axes and float contract)
        xshape = jnp.broadcast_shapes(*[jnp.shape(xi) for xi in x])
        shape = jnp.broadcast_shapes(xshape, *[v.shape for v in vals])
        dtype = jnp.result_type(*vals)
        if not jnp.issubdtype(dtype, jnp.inexact):
            dtype = jnp.result_type(float)
        zero = jnp.zeros(shape, dtype)
        rows = [[zero] * d for _ in range(d)]
        for k, (a, b) in enumerate(self._metric_nonzero):
            rows[a][b] = jnp.broadcast_to(vals[k], shape).astype(dtype)
        return jnp.stack([jnp.stack(r) for r in rows])

    def df32_fns(self) -> dict:
        """Model functions compiled against the double-f32 engine
        (lowering/df32.py) — same generated sources, DF arithmetic.  Used by
        the high-precision Pallas kernel."""
        if self._df32_fns is None:
            from .lowering.df32 import compile_df32  # noqa: PLC0415

            self._df32_fns = {
                "potential": compile_df32(self.potential),
                "hesse": compile_df32(self._hesse),
                "grad_square": compile_df32(self.grad_square),
                "grad": compile_df32(self._grad),
            }
        return self._df32_fns

    def solver_df32_fns(self) -> dict:
        """EoM/constraint functions compiled against the double-f32 engine —
        used by the Pallas batched background solver (round 3): the state
        advances in DF pairs inside compiled Mosaic, where compensated
        arithmetic is EFT-safe, instead of TPU's ~30×-slower emulated f64
        under ``lax.while_loop``."""
        if getattr(self, "_solver_df32_fns", None) is None:
            from .lowering.df32 import compile_df32  # noqa: PLC0415

            self._solver_df32_fns = {
                "eom": compile_df32(self.eom),
                "eom_h": compile_df32(self.eom_h),
                "eom_hdot": compile_df32(self.eom_hdot),
            }
        return self._solver_df32_fns

    #: special functions the df32 engine implements —
    #: lowering/df32_special.py (round 4: the full GSL printer family,
    #: reference compiler.py:158-212; erf/erfc/gamma/lgamma ride _amath)
    _DF32_SPECIALS = frozenset(
        {"hyp0f1", "hyp1f1", "hyp2f1", "hyp2f0",
         "besselj", "bessely", "besseli", "besselk",
         "sph_jn", "sph_yn"}
    )

    #: members of _DF32_SPECIALS with no static-order requirement
    _DF32_HYP = frozenset({"hyp0f1", "hyp1f1", "hyp2f1", "hyp2f0"})

    @property
    def df32_compatible(self) -> bool:
        """True when every construct in the lowered sources has a df32-engine
        implementation.  Used by engine auto-selection: a 2-field model on
        TPU defaults to the fast compensated kernel only when this holds —
        otherwise the f64-XLA engine is chosen, so models using (say) hyp1f1
        or fractional Bessel orders keep working out of the box instead of
        hitting the engine's NotImplementedError."""
        if getattr(self, "_df32_ok", None) is None:
            import re  # noqa: PLC0415

            from .lowering import df32  # noqa: PLC0415

            jnp_names = (set(vars(df32._jnp_like()))
                         | set(df32._LazyConstNamespace._LAZY))
            amath_names = set(vars(df32._amath_like()))
            ok = True
            srcs = (self.potential.source, self._hesse.source,
                    self.grad_square.source, self._grad.source)
            for src in srcs:
                # every jax.numpy.* / _amath.* call must exist in the df32
                # engine's namespaces (re-learned when the α-attractor's
                # Abs crashed the auto-selected engine); anything else
                # (jax.scipy, erf/gamma via _amath additions the engine
                # lacks) routes to the XLA engine instead of crashing
                for m in re.finditer(r"jax\.numpy\.(\w+)", src):
                    if m.group(1) not in jnp_names:
                        ok = False
                        break
                if ok:
                    for m in re.finditer(r"_amath\.(\w+)", src):
                        if m.group(1) not in amath_names:
                            ok = False
                            break
                if not ok or "jax.scipy" in src:
                    ok = False
                    break
                for m in re.finditer(r"_special\.(\w+)\(\s*([^,)]+)[,)]", src):
                    name, first = m.group(1), m.group(2).strip()
                    if name not in self._DF32_SPECIALS:
                        ok = False
                        break
                    if name not in self._DF32_HYP:
                        # Bessel family: the engine needs a static order —
                        # integer (any), or fractional inside the df32
                        # engine's envelope (round 5: ANY non-integer
                        # |ν| ≤ 30, near-integer included via the
                        # reduced-order Temme/CF2 route; fractional
                        # spherical orders via the half-integer
                        # connection, |ν| ≤ 29.5).  Anything non-literal
                        # is conservative-False.
                        try:
                            from fractions import Fraction  # noqa: PLC0415

                            v = float(Fraction(first))  # "5/2" and "2.5"
                        except (ValueError, ZeroDivisionError):
                            ok = False
                            break
                        if v != int(v):
                            from .lowering.df32_special import (  # noqa: PLC0415
                                _static_frac_order,
                            )

                            if name in ("sph_jn", "sph_yn"):
                                if abs(v) > 29.5:
                                    ok = False
                                    break
                            elif _static_frac_order(v) is None:
                                ok = False
                                break
                if not ok:
                    break
            self._df32_ok = ok
        return self._df32_ok

    def tf_fns(self) -> dict:
        """Model functions compiled against the triple-f32 extended-precision
        engine (lowering/tf32.py, ~71-bit) — for cancellation-heavy models
        (EGNO-class covariant Hesse) where every ~48-bit format, and even the
        reference's f64, loses 7-8 digits (docs/numerics.md §8)."""
        if getattr(self, "_tf_fns", None) is None:
            from .lowering.tf32 import compile_tf32  # noqa: PLC0415

            self._tf_fns = {
                "potential": compile_tf32(self.potential),
                "hesse": compile_tf32(self._hesse),
                "grad_square": compile_tf32(self.grad_square),
                "grad": compile_tf32(self._grad),
            }
        return self._tf_fns

    def edf_fns(self) -> dict:
        """Model functions compiled against the range-extended double-f32
        engine (lowering/edf32.py) — for models whose intermediates leave
        the f32 dynamic range (D5-class), which no plain TPU float
        representation survives."""
        if getattr(self, "_edf_fns", None) is None:
            from .lowering.edf32 import compile_edf32  # noqa: PLC0415

            self._edf_fns = {
                "potential": compile_edf32(self.potential),
                "hesse": compile_edf32(self._hesse),
                "grad_square": compile_edf32(self.grad_square),
                "grad": compile_edf32(self._grad),
            }
        return self._edf_fns

    # ------------------------------------------------------------------ #
    # symbol table (reference compiler.py:252-276)                       #
    # ------------------------------------------------------------------ #

    def lookup_symbol(self, symbol: sympy.Symbol) -> str | None:
        """Compiled slot ("x[n]" / "args[n]") for a sympy symbol, or None."""
        from sympy.printing.c import C99CodePrinter  # noqa: PLC0415

        name = C99CodePrinter()._print_Symbol(symbol)
        if not isinstance(name, str):
            return None
        return self.symbol_dictionary.get(name)

    def print_sym_lookup_table(self) -> None:
        print("[Symbol Dictionary]")
        for old, new in self.symbol_dictionary.items():
            print(f"{old} -> {new}")

    # ------------------------------------------------------------------ #
    # serialization (compile-once / scan-many)                           #
    # ------------------------------------------------------------------ #

    @property
    def model(self) -> InflationModel:
        return self._model

    @property
    def geometry(self):
        """Field-space geometry surfaces (Christoffels, Riemann, Ricci
        scalar, coordinate covariant Hesse), lowered lazily on first use —
        see :class:`inflatox_tpu.geometry.Geometry`."""
        geo = getattr(self, "_geometry", None)
        if geo is None:
            from .geometry import Geometry  # noqa: PLC0415

            geo = self._geometry = Geometry(self)
        return geo

    def save(self, path: str) -> None:
        """Write a JSON bundle that :meth:`load` can re-lower without
        re-running the symbolic stage."""
        bundle = {
            "schema_version": __schema_version__,
            "options": dict(self._cse_opts),
            "model": self._model.to_dict(),
        }
        with open(path, "w") as f:
            json.dump(bundle, f)

    @classmethod
    def load(cls, path: str) -> "CompiledModel":
        with open(path) as f:
            bundle = json.load(f)
        found = bundle.get("schema_version", "0.0.0")
        if not schema_compatible(found):
            raise SchemaVersionError(found, __schema_version__)
        model = InflationModel.from_dict(bundle["model"])
        registry = SymbolRegistry.from_model(model)
        return cls(model, registry, **bundle.get("options", {}))


#: Drop-in alias for users porting from the reference API.
CompilationArtifact = CompiledModel


class Compiler:
    """Lowers an :class:`InflationModel` into a :class:`CompiledModel`.

    Constructor surface matches the reference ``Compiler``
    (compiler.py:315-382); flags that only made sense for the C pipeline are
    accepted for compatibility and documented below.

    Args
    ----
    model: the symbolic model to compile.
    output_path: if given, :meth:`compile` also saves the serialized bundle
        to this path (the reference wrote its C source / dylib there).
    cleanup: accepted for compatibility.  There is no on-disk artifact to
        clean up unless ``output_path`` is set, in which case ``cleanup=False``
        preserves the bundle (like the reference's kept ``.bin``).
    silent: suppress console output.
    link_gsl: accepted for compatibility; special-function support
        (:mod:`inflatox_tpu.lowering.special`) is always available — no
        separate linking step exists.
    cse: run sympy common-subexpression elimination before lowering.  XLA
        performs CSE on the jaxpr anyway; enable this to shrink giant sympy
        trees (it bounds lowering/tracing time, not runtime).
    max_cses: cap on CSE symbols (reference compiler.py:354-356).
    compiler_flags: accepted for compatibility; there is no external compiler
        to pass flags to.  Ignored with a note when not None.
    """

    def __init__(
        self,
        model: InflationModel,
        output_path: str | None = None,
        cleanup: bool = True,
        silent: bool = False,
        link_gsl: bool = False,
        cse: bool = False,
        max_cses: int = 1000,
        compiler_flags: Sequence[str] | None = None,
    ):
        self.model = model
        self.output_path = output_path
        self.cleanup = cleanup
        self.silent = silent
        self.link_gsl = link_gsl
        self.cse = cse
        self.max_cses = max_cses
        if compiler_flags is not None and not silent:
            log_info(
                "compiler_flags are ignored by the TPU backend (XLA is the "
                "native compiler); accepted for API compatibility."
            )

    def compile(self) -> CompiledModel:
        """Lower the model; returns a :class:`CompiledModel`.

        Reference parity: ``Compiler.compile`` (compiler.py:600-650)."""
        if not self.silent:
            print("Compiling model...")
        registry = SymbolRegistry.from_model(self.model)
        compiled = CompiledModel(
            self.model,
            registry,
            cse=self.cse,
            max_cses=self.max_cses,
            silent=self.silent,
        )
        if self.output_path is not None:
            compiled.save(self.output_path)
            if self.cleanup:
                # mirror auto_cleanup semantics: artifact removed when the
                # handle dies (reference compiler.py:247-250)
                import atexit  # noqa: PLC0415

                path = self.output_path
                atexit.register(lambda: os.path.exists(path) and os.remove(path))
        return compiled
