"""Version information for inflatox-tpu.

Reference parity: /root/reference/python/inflatox/version.py:20-22 exposes
``__version__`` (package metadata) and ``__abi_version__`` ("5.0.0", the dylib
ABI contract checked at load time by dylib.rs:78-92).

The TPU rebuild has no dlopen'd ABI; the equivalent contract is the schema of a
serialized :class:`~inflatox_tpu.compiler.CompiledModel` bundle.  We keep the
same "major.minor must match, patch ignored" semantics for deserialization
(see inflatox_version.rs:48-53 in the reference).
"""

__version__ = "0.1.0"

# Schema version of serialized CompiledModel bundles.  Major.minor must match
# for a bundle to load; patch is ignored.
__schema_version__ = "1.0.0"


#: Deprecated alias kept for reference-API familiarity (the reference's
#: ``__abi_version__`` guarded its dlopen ABI; here the analogous contract is
#: the bundle schema version).
__abi_version__ = __schema_version__


def schema_compatible(other: str) -> bool:
    """True if a bundle written with schema version ``other`` can be loaded.

    Mirrors the reference's ABI equality rule (major+minor equal, patch
    ignored; inflatox_version.rs:48-53).
    """
    ours = __schema_version__.split(".")
    theirs = str(other).split(".")
    return len(theirs) >= 2 and ours[0] == theirs[0] and ours[1] == theirs[1]
