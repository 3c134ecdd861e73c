from .registry import SymbolRegistry
from .jax_lowering import LoweredFunction, lower

__all__ = ["SymbolRegistry", "LoweredFunction", "lower"]
