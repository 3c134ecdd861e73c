"""Gradient-based Bayesian inference over model parameters.

The reference's parameter studies are grid scans over opaque C callables
(README.md:12-13); nothing downstream of its dlopen'd dylib is
differentiable, so posterior sampling is out of reach there.  Here every
observable is a pure JAX function of the parameters
(:mod:`~inflatox_tpu.observables`), which makes Hamiltonian Monte Carlo —
whose proposals follow ∇log p — the natural sampler: one compiled
``lax.scan`` per phase, chains vmapped (and mesh-shardable) across
devices.

Pieces:

* :func:`observable_log_posterior` — a Gaussian-likelihood log-posterior
  over parameters from the slow-roll observable factories (or any dict of
  ``fn(x, args)`` callables), with an optional differentiable prior.
* :func:`sample_posterior` — adaptive HMC: leapfrog proposals with a
  dual-averaging step-size (Hoffman & Gelman 2014 schedule, target accept
  0.8) and a diagonal mass matrix estimated in the second half of warmup;
  warmup and sampling each run as ONE jitted ``lax.scan`` with every
  chain vmapped.  Returns samples plus convergence diagnostics
  (acceptance rate, split-R̂, effective sample size).
* :func:`r_hat` / :func:`effective_sample_size` — the standard split-R̂
  and initial-positive-sequence autocorrelation ESS, host-side.

HMC needs an everywhere-differentiable log-density: sample bounded or
positive parameters in an unconstrained space (e.g. log-space) and fold
the Jacobian into the prior — the φ²-mass test does exactly this.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .utils.logging import log_warn

__all__ = [
    "observable_log_posterior",
    "sample_posterior",
    "r_hat",
    "effective_sample_size",
]


def observable_log_posterior(
    artifact,
    x,
    data: dict,
    sigma: dict,
    prior: Callable | None = None,
) -> Callable:
    """Gaussian-likelihood log-posterior over parameters at a field point.

    ``data``/``sigma`` map observable names (keys of
    :func:`~inflatox_tpu.observables.slow_roll`: ``epsilon_v``, ``eta_v``,
    ``n_s``, ``r``) to measured values and uncertainties; the returned
    ``logp(theta)`` is ``−½ Σ ((obs_k(x, θ) − data_k)/σ_k)²`` plus
    ``prior(theta)`` (any differentiable log-prior; omit for improper
    flat).  Jittable and differentiable — feed to
    :func:`sample_posterior`.
    """
    from .observables import slow_roll

    fn = slow_roll(artifact)
    keys = tuple(data.keys())
    missing = [k for k in keys if k not in sigma]
    if missing:
        raise ValueError(f"sigma missing entries for {missing}")
    x = jnp.asarray(x, dtype=jnp.float64)
    d_vec = jnp.array([float(data[k]) for k in keys])
    s_vec = jnp.array([float(sigma[k]) for k in keys])

    def logp(theta):
        sr = fn(x, theta)
        vals = jnp.stack([sr[k] for k in keys])
        ll = -0.5 * jnp.sum(((vals - d_vec) / s_vec) ** 2)
        return ll + (prior(theta) if prior is not None else 0.0)

    return logp


# ----------------------------------------------------------------------- #
# adaptive HMC                                                             #
# ----------------------------------------------------------------------- #


def _leapfrog(grad_fn, q, p, eps, inv_mass, steps):
    """``steps`` leapfrog steps of H = −logp(q) + ½ pᵀ M⁻¹ p."""
    def body(_, qp):
        q, p = qp
        p = p + 0.5 * eps * grad_fn(q)
        q = q + eps * inv_mass * p
        p = p + 0.5 * eps * grad_fn(q)
        return (q, p)

    return lax.fori_loop(0, steps, body, (q, p))


def _hmc_kernel(logp_and_grad, grad_fn, steps):
    """One HMC transition: (q, logp, key, eps, inv_mass) → accept step.

    The leapfrog count is jittered uniformly in [⌈steps/2⌉, steps] per
    transition — fixed-length HMC resonates on near-Gaussian targets
    (after mass adaptation a harmonic mode rotates ~ε per step, so a
    fixed ε·L near a multiple of 2π barely moves; measured as a 10×
    ESS collapse on the correlated-Gaussian test before the jitter)."""
    def kernel(q, lp, key, eps, inv_mass):
        k1, k2, k3, key = jax.random.split(key, 4)
        n_steps = jax.random.randint(
            k3, (), max(1, (int(steps) + 1) // 2), int(steps) + 1
        )
        p = jax.random.normal(k1, q.shape) / jnp.sqrt(inv_mass)
        q_new, p_new = _leapfrog(grad_fn, q, p, eps, inv_mass, n_steps)
        lp_new, _ = logp_and_grad(q_new)
        h_old = -lp + 0.5 * jnp.sum(inv_mass * p * p)
        h_new = -lp_new + 0.5 * jnp.sum(inv_mass * p_new * p_new)
        # NaN-safe: a diverged trajectory is always rejected
        log_accept = jnp.where(
            jnp.isfinite(h_new), jnp.minimum(0.0, h_old - h_new), -jnp.inf
        )
        accept = jnp.log(jax.random.uniform(k2)) < log_accept
        q = jnp.where(accept, q_new, q)
        lp = jnp.where(accept, lp_new, lp)
        return q, lp, key, jnp.exp(log_accept)

    return kernel


def sample_posterior(
    logp: Callable,
    x0,
    *,
    num_samples: int = 1000,
    num_warmup: int = 500,
    num_chains: int = 4,
    num_leapfrog: int = 32,
    target_accept: float = 0.8,
    initial_step_size: float = 0.1,
    jitter: float = 0.01,
    seed: int = 0,
    mesh=None,
) -> dict:
    """Adaptive Hamiltonian Monte Carlo over a differentiable log-density.

    ``logp(theta)`` must be a scalar, jittable, differentiable function of
    a ``(d,)`` parameter vector (:func:`observable_log_posterior` builds
    one from measured observables; any hand-written density works —
    including losses that run :func:`~inflatox_tpu.observables.solve_eom_fixed`
    inside).  ``x0`` ((d,) or (num_chains, d)) seeds the chains; with one
    row, chains start at ``x0`` plus N(0, ``jitter``²) scatter.

    Warmup adapts the step size by dual averaging (Hoffman & Gelman 2014,
    target acceptance ``target_accept``) and estimates a diagonal mass
    matrix (inverse posterior variances) from the second half of warmup;
    both phases compile to one ``lax.scan`` each with all chains vmapped.
    ``mesh=`` shards the chain axis across devices (zero collectives) —
    pad ``num_chains`` to a multiple of the mesh size.

    Returns ``{"samples" (num_chains, num_samples, d), "log_prob"
    (num_chains, num_samples), "accept_rate" (num_chains,), "step_size",
    "inv_mass" (d,), "r_hat" (d,), "ess" (d,)}`` — numpy, after one
    device fetch.  A warning is logged when split-R̂ exceeds 1.05 or the
    acceptance rate collapses.
    """
    if not 0.0 < target_accept < 1.0:
        raise ValueError(f"target_accept must be in (0, 1), got {target_accept}")
    x0 = jnp.atleast_2d(jnp.asarray(x0, dtype=jnp.float64))
    d = x0.shape[-1]
    key = jax.random.PRNGKey(int(seed))
    if x0.shape[0] == 1 and num_chains > 1:
        key, k0 = jax.random.split(key)
        x0 = x0 + float(jitter) * jax.random.normal(k0, (num_chains, d))
    elif x0.shape[0] != num_chains:
        raise ValueError(
            f"x0 has {x0.shape[0]} rows but num_chains = {num_chains} — "
            "pass one row (auto-jittered) or one per chain"
        )

    logp_and_grad = jax.value_and_grad(logp)

    def lp_pair(q):
        v, g = logp_and_grad(q)
        return v, g

    grad_fn = lambda q: logp_and_grad(q)[1]  # noqa: E731
    kernel = _hmc_kernel(lp_pair, grad_fn, int(num_leapfrog))

    # dual-averaging constants (Hoffman & Gelman 2014, §3.2)
    gamma, t0, kappa = 0.05, 10.0, 0.75
    w_half = int(num_warmup) // 2

    def warmup_step(inv_mass, mu):
        def step(state, i):
            q, lp, key, log_eps, log_eps_bar, h_bar = state
            key, sub = jax.random.split(key)
            subs = jax.random.split(sub, q.shape[0])
            q, lp, _, acc = jax.vmap(
                kernel, in_axes=(0, 0, 0, None, None)
            )(q, lp, subs, jnp.exp(log_eps), inv_mass)
            # dual averaging on the chain-mean acceptance
            a = jnp.mean(acc)
            t = i + 1.0
            h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + (
                (float(target_accept) - a) / (t + t0)
            )
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            return (q, lp, key, log_eps, log_eps_bar, h_bar), (a, q)

        return step

    lp0 = jax.vmap(logp)(x0)

    @jax.jit
    def run_warmup(q, lp, key):
        # phase 1: dual-average the step size under unit mass, estimate the
        # diagonal mass from the second half; phase 2: re-adapt the step
        # size under the estimated mass (a step size tuned to one metric is
        # miscalibrated for another — Stan's windowed adaptation, two
        # windows)
        state = (q, lp, key, jnp.log(float(initial_step_size)),
                 jnp.log(float(initial_step_size)), 0.0)
        state, (accs1, qs) = lax.scan(
            warmup_step(jnp.ones(d), jnp.log(10.0 * float(initial_step_size))),
            state, jnp.arange(float(num_warmup)),
        )
        q, lp, key, _, log_eps_bar, _ = state
        var = jnp.maximum(
            jnp.var(qs[w_half:].reshape(-1, q.shape[-1]), axis=0), 1e-12
        )
        eps1 = jnp.exp(log_eps_bar)
        # rescale the phase-1 step into the new metric as the starting
        # guess: proposal scale in q-space is ~ eps·√(inv_mass)
        eps_guess = eps1 / jnp.sqrt(jnp.max(var))
        state = (q, lp, key, jnp.log(eps_guess), jnp.log(eps_guess), 0.0)
        state, (accs2, _) = lax.scan(
            warmup_step(var, jnp.log(10.0 * eps_guess)),
            state, jnp.arange(float(w_half)),
        )
        q, lp, key, _, log_eps_bar, _ = state
        return q, lp, key, jnp.exp(log_eps_bar), var, \
            jnp.concatenate([accs1, accs2])

    @jax.jit
    def run_sampling(q, lp, key, eps, inv_mass):
        def step(state, _):
            q, lp, key = state
            key, sub = jax.random.split(key)
            subs = jax.random.split(sub, q.shape[0])
            q, lp, _, acc = jax.vmap(
                kernel, in_axes=(0, 0, 0, None, None)
            )(q, lp, subs, eps, inv_mass)
            return (q, lp, key), (q, lp, acc)

        (_, _, _), (qs, lps, accs) = lax.scan(
            step, (q, lp, key), None, length=int(num_samples)
        )
        return qs, lps, accs

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        if x0.shape[0] % mesh.devices.size:
            raise ValueError(
                f"num_chains = {x0.shape[0]} must be a multiple of the "
                f"mesh size {mesh.devices.size}"
            )
        sh = NamedSharding(mesh, PartitionSpec(axis))
        x0 = jax.device_put(x0, sh)
        lp0 = jax.device_put(lp0, sh)

    q, lp, key, eps, var, w_accs = run_warmup(x0, lp0, key)
    # floored — a parameter the warmup never moved must not give a 0 mass
    inv_mass = jnp.asarray(np.maximum(np.asarray(var), 1e-12))
    qs, lps, accs = run_sampling(q, lp, key, eps, inv_mass)

    samples = np.moveaxis(np.asarray(qs), 0, 1)      # (chains, draws, d)
    log_prob = np.asarray(lps).T
    accept = np.asarray(accs).mean(axis=0)
    rh = r_hat(samples)
    ess = effective_sample_size(samples)
    if np.any(rh > 1.05):
        log_warn(
            f"sample_posterior: split-R-hat up to {rh.max():.3f} > 1.05 — "
            "chains have not mixed; raise num_warmup/num_samples or "
            "reparameterize"
        )
    if accept.mean() < 0.5 * target_accept:
        log_warn(
            f"sample_posterior: acceptance {accept.mean():.2f} far below "
            f"the {target_accept} target — the step-size adaptation "
            "failed; try a smaller initial_step_size"
        )
    return {
        "samples": samples,
        "log_prob": log_prob,
        "accept_rate": accept,
        "step_size": float(eps),
        "inv_mass": np.asarray(inv_mass),
        "r_hat": rh,
        "ess": ess,
    }


# ----------------------------------------------------------------------- #
# diagnostics (host-side numpy)                                            #
# ----------------------------------------------------------------------- #


def r_hat(samples) -> np.ndarray:
    """Split-R̂ (Gelman–Rubin with halved chains) per parameter.

    ``samples`` is (chains, draws, d); values ≈ 1 indicate mixing."""
    s = np.asarray(samples, dtype=float)
    c, n, d = s.shape
    half = n // 2
    s = np.concatenate([s[:, :half], s[:, half : 2 * half]], axis=0)
    m, n = s.shape[0], s.shape[1]
    chain_mean = s.mean(axis=1)                      # (m, d)
    chain_var = s.var(axis=1, ddof=1)                # (m, d)
    b = n * chain_mean.var(axis=0, ddof=1)
    w = chain_var.mean(axis=0)
    var_plus = (n - 1) / n * w + b / n
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.sqrt(var_plus / w)


def effective_sample_size(samples) -> np.ndarray:
    """ESS per parameter via the initial-positive-sequence estimator on the
    chain-averaged autocorrelation (Geyer 1992 / Stan's formulation,
    simplified to within-chain correlations)."""
    s = np.asarray(samples, dtype=float)
    c, n, d = s.shape
    ess = np.empty(d)
    for j in range(d):
        rho_sum = 0.0
        x = s[:, :, j] - s[:, :, j].mean(axis=1, keepdims=True)
        var = (x * x).mean()
        if var == 0.0:
            ess[j] = np.nan
            continue
        t = 1
        while t < n - 1:
            rho_t = (x[:, : n - t] * x[:, t:]).mean() / var
            rho_t1 = (
                (x[:, : n - t - 1] * x[:, t + 1 :]).mean() / var
                if t + 1 < n else 0.0
            )
            if rho_t + rho_t1 <= 0.0:
                break
            rho_sum += rho_t + rho_t1
            t += 2
        ess[j] = c * n / (1.0 + 2.0 * rho_sum)
    return ess
