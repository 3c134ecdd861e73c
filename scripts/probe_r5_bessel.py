"""Round-5 fractional-Bessel envelope validation (CPU eager, DF vs scipy).

Covers the three VERDICT-r4 item-5 gaps: |ν| > 8 (reduced-order route),
near-integer fractional ν (Temme/CF2), fractional spherical orders.
Run:  python -u scripts/probe_r5_bessel.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.special as sps

import jax.numpy as jnp

from inflatox_tpu.lowering import df32_special as dsp
from inflatox_tpu.lowering.df32 import DF

z = np.concatenate([
    np.geomspace(0.02, 1.9, 40),
    np.linspace(2.01, 14.9, 40),
    np.linspace(15.1, 60.0, 40),
    np.linspace(61.0, 120.0, 20),
])
Z = DF.of(jnp.asarray(z))


def check(name, got_df, want, zvals=z, floor=None):
    """Full-precision assertion inside the DF representability envelope:
    the Dekker split overflows above ~4e34 (2^128/2^13 headroom) and the
    lo word denormalizes below ~1e-30, so pairs outside [1e-30, 4e34]
    cannot hold ~48 bits (docs/numerics.md) — out-of-range lanes go
    inf/NaN loudly and are excluded here."""
    got = np.asarray(got_df.to_f64())
    want = np.asarray(want)
    fin = np.isfinite(want) & (np.abs(want) < 4e34) & (np.abs(want) > 1e-27)
    # amplitude floor: near zeros of oscillatory J/Y relative error is
    # meaningless; floor by the local envelope like the f64 validation
    denom = np.maximum(np.abs(want), floor if floor is not None else 0.0)
    rel = np.abs(got - want)[fin] / denom[fin]
    q95, mx = np.quantile(rel, 0.95), rel.max()
    tag = "OK " if q95 < 3e-12 and mx < 1e-9 else "FAIL"
    print(f"{tag} {name:28s} q95={q95:.2e} max={mx:.2e} n={fin.sum()}",
          flush=True)
    return q95, mx


print("== J/Y large + near-integer orders ==")
for nu in [2.01, 1.999, 0.01, 3.0001, 8.5, 12.7, 20.45, 25.3, 29.9]:
    amp = np.sqrt(2.0 / (np.pi * z))  # oscillatory envelope floor
    check(f"J_{nu}", dsp.besselj(nu, Z), sps.jv(nu, z), floor=amp)
    check(f"Y_{nu}", dsp.bessely(nu, Z), sps.yv(nu, z), floor=amp)

print("== negative orders ==")
for nu in [-2.01, -8.5, -12.7, -25.3]:
    amp = np.sqrt(2.0 / (np.pi * z))
    check(f"J_{nu}", dsp.besselj(nu, Z), sps.jv(nu, z), floor=amp)
    check(f"Y_{nu}", dsp.bessely(nu, Z), sps.yv(nu, z), floor=amp)

print("== existing envelope regression (reflection route) ==")
for nu in [0.3, 2.5, 4.7, 7.3, -3.6]:
    amp = np.sqrt(2.0 / (np.pi * z))
    check(f"J_{nu}", dsp.besselj(nu, Z), sps.jv(nu, z), floor=amp)
    check(f"Y_{nu}", dsp.bessely(nu, Z), sps.yv(nu, z), floor=amp)

print("== K near-integer + large order (z where representable) ==")
zk = np.geomspace(0.05, 30.0, 90)
ZK = DF.of(jnp.asarray(zk))
for nu in [2.01, 0.005, 5.9999, 12.7, 25.3, 0.3, 4.7]:
    check(f"K_{nu}", dsp.besselk(nu, ZK), sps.kv(nu, zk), zvals=zk)

print("== I large order ==")
zi = np.geomspace(0.05, 12.0, 60)
ZI = DF.of(jnp.asarray(zi))
for nu in [2.01, 12.7, 25.3, -2.01]:
    check(f"I_{nu}", dsp.besseli(nu, ZI), sps.iv(nu, zi), zvals=zi)

print("== fractional spherical ==")
zs_ = np.concatenate([np.geomspace(0.05, 14.0, 50),
                      np.linspace(15.0, 60.0, 30)])
ZS = DF.of(jnp.asarray(zs_))
for nu in [2.3, 0.7, 5.25, 12.6]:
    amp = 1.0 / zs_
    check(f"sph_j_{nu}", dsp.sph_jn(nu, ZS),
          np.sqrt(np.pi / (2 * zs_)) * sps.jv(nu + 0.5, zs_), floor=amp)
    check(f"sph_y_{nu}", dsp.sph_yn(nu, ZS),
          np.sqrt(np.pi / (2 * zs_)) * sps.yv(nu + 0.5, zs_), floor=amp)

print("done", flush=True)
