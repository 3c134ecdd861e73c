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
    "log_evidence_laplace",
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


def _hmc_kernel(logp_and_grad, steps):
    """One HMC transition: (q, logp, ∇logp, key, eps, inv_mass) → accept.

    The chain state carries ∇logp(q), so a transition of L leapfrog steps
    costs exactly L gradient evaluations (adjacent half-kicks fused into
    full kicks; the final half-kick's value_and_grad supplies both the
    acceptance logp and the next state's gradient — the naive
    half-kick/half-kick loop costs 2L+1).

    The leapfrog count is jittered uniformly in [⌈steps/2⌉, steps] per
    transition — fixed-length HMC resonates on near-Gaussian targets
    (after mass adaptation a harmonic mode rotates ~ε per step, so a
    fixed ε·L near a multiple of 2π barely moves; measured as a 10×
    ESS collapse on the correlated-Gaussian test before the jitter)."""
    def kernel(q, lp, g, key, eps, inv_mass):
        k1, k2, k3, key = jax.random.split(key, 4)
        n_steps = jax.random.randint(
            k3, (), max(1, (int(steps) + 1) // 2), int(steps) + 1
        )
        p = jax.random.normal(k1, q.shape) / jnp.sqrt(inv_mass)
        h_old = -lp + 0.5 * jnp.sum(inv_mass * p * p)

        def body(_, qp):
            q, p = qp
            q = q + eps * inv_mass * p
            p = p + eps * logp_and_grad(q)[1]
            return (q, p)

        p_new = p + 0.5 * eps * g
        q_new, p_new = lax.fori_loop(0, n_steps - 1, body, (q, p_new))
        q_new = q_new + eps * inv_mass * p_new
        lp_new, g_new = logp_and_grad(q_new)
        p_new = p_new + 0.5 * eps * g_new

        h_new = -lp_new + 0.5 * jnp.sum(inv_mass * p_new * p_new)
        # NaN-safe: a diverged trajectory is always rejected
        log_accept = jnp.where(
            jnp.isfinite(h_new), jnp.minimum(0.0, h_old - h_new), -jnp.inf
        )
        accept = jnp.log(jax.random.uniform(k2)) < log_accept
        q = jnp.where(accept, q_new, q)
        lp = jnp.where(accept, lp_new, lp)
        g = jnp.where(accept, g_new, g)
        return q, lp, g, key, jnp.exp(log_accept)

    return kernel


def _nuts_kernel(logp_and_grad, max_depth=8, max_delta_energy=1000.0):
    """One No-U-Turn transition with the same state contract as
    :func:`_hmc_kernel`: (q, logp, ∇logp, key, eps, inv_mass) → (q, lp, g,
    key, accept_stat).

    Iterative multinomial NUTS (Hoffman & Gelman 2014 termination;
    Betancourt 2017 multinomial leaf sampling; the iterative subtree
    U-turn bookkeeping of Phan & Pradhan's numpyro formulation, which
    needs only a ``max_depth``-deep checkpoint stack instead of
    recursion): the trajectory doubles in a random direction until a
    sub- or whole-trajectory U-turn or a divergence, each doubling one
    masked ``lax.while_loop`` of leapfrog steps; the proposal is drawn
    ∝ exp(−ΔH) progressively within subtrees and biased-progressively
    across doublings.  Per transition ≤ 2^max_depth gradient
    evaluations; accept_stat is the trajectory-mean min(1, e^{−ΔH}),
    which feeds the same dual-averaging schedule as HMC."""
    max_depth = int(max_depth)

    def _popcount(x):
        c = jnp.int32(0)
        for k in range(max_depth + 1):
            c = c + ((x >> k) & 1)
        return c

    def _trailing_ones(x):
        c = jnp.int32(0)
        alive = jnp.bool_(True)
        for k in range(max_depth + 1):
            alive = alive & (((x >> k) & 1) == 1)
            c = c + alive.astype(jnp.int32)
        return c

    def kernel(q, lp, g, key, eps, inv_mass):
        d = q.shape[-1]
        kp, key = jax.random.split(key)
        p0 = jax.random.normal(kp, q.shape) / jnp.sqrt(inv_mass)

        def ke(p):
            return 0.5 * jnp.sum(inv_mass * p * p)

        h0 = -lp + ke(p0)

        def leapfrog(qq, pp, gg, dirn):
            e = eps * dirn
            p1 = pp + 0.5 * e * gg
            q1 = qq + e * inv_mass * p1
            lp1, g1 = logp_and_grad(q1)
            return q1, p1 + 0.5 * e * g1, lp1, g1

        def uturn(dq, p_a, p_b):
            return (jnp.sum(dq * inv_mass * p_a) < 0.0) | (
                jnp.sum(dq * inv_mass * p_b) < 0.0)

        # outer state: trajectory edges (physical left/right), current
        # proposal, total multinomial log-weight, flags, accept-stat sums
        def outer_cond(s):
            depth, turning, diverged = s[0], s[1], s[2]
            return (depth < jnp.int32(max_depth)) & ~turning & ~diverged

        def outer_body(s):
            (depth, _, _, key, ql, pl, gl, lpl, qr, pr, gr, lpr,
             qp_, lpp_, gp_, log_w, s_acc, n_leaf) = s
            key, kdir, ktree = jax.random.split(key, 3)
            dirn = jnp.where(jax.random.bernoulli(kdir), 1.0, -1.0)
            qe = jnp.where(dirn > 0, qr, ql)
            pe = jnp.where(dirn > 0, pr, pl)
            ge = jnp.where(dirn > 0, gr, gl)
            lpe = jnp.where(dirn > 0, lpr, lpl)

            n_sub = jnp.left_shift(jnp.int32(1), depth)

            # ---- build one subtree of up to n_sub leaves ---------------- #
            def sub_cond(ss):
                i, turn, div = ss[0], ss[1], ss[2]
                return (i < n_sub) & ~turn & ~div

            def sub_body(ss):
                (i, _, _, skey, qq, pp, gg, llp, qsp, lpsp, gsp, lws,
                 sacc, nl, cq, cp) = ss
                skey, ksel = jax.random.split(skey)
                qq, pp, llp, gg = leapfrog(qq, pp, gg, dirn)
                h = -llp + ke(pp)
                de = h - h0
                div = ~jnp.isfinite(de) | (de > max_delta_energy)
                lw_leaf = jnp.where(div, -jnp.inf, -de)
                new_tot = jnp.logaddexp(lws, lw_leaf)
                take = jnp.log(jax.random.uniform(ksel)) < lw_leaf - new_tot
                qsp = jnp.where(take, qq, qsp)
                lpsp = jnp.where(take, llp, lpsp)
                gsp = jnp.where(take, gg, gsp)
                sacc = sacc + jnp.where(
                    jnp.isfinite(de), jnp.minimum(1.0, jnp.exp(-de)), 0.0)
                nl = nl + 1
                # checkpoint stack (numpyro's leaf→slot map): even leaves
                # push their state at slot popcount(i >> 1); odd leaves
                # U-turn-check against slots [idx_max − trailing_ones(i)
                # + 1, idx_max]
                idx_max = _popcount(i >> 1)
                even = (i & 1) == 0
                cq = jnp.where(even, cq.at[idx_max].set(qq), cq)
                cp = jnp.where(even, cp.at[idx_max].set(pp), cp)
                idx_min = idx_max - _trailing_ones(i) + 1
                turn = jnp.bool_(False)
                for slot in range(max_depth + 1):
                    active = (~even) & (jnp.int32(slot) >= idx_min) & (
                        jnp.int32(slot) <= idx_max)
                    dq = dirn * (qq - cq[slot])
                    turn = turn | (active & uturn(dq, cp[slot], pp))
                return (i + 1, turn, div, skey, qq, pp, gg, llp,
                        qsp, lpsp, gsp, new_tot, sacc, nl, cq, cp)

            sub0 = (jnp.int32(0), jnp.bool_(False), jnp.bool_(False),
                    ktree, qe, pe, ge, lpe,
                    qe, lpe, ge, -jnp.inf,
                    jnp.float64(0.0), jnp.int32(0),
                    jnp.zeros((max_depth + 1, d), q.dtype),
                    jnp.zeros((max_depth + 1, d), q.dtype))
            (_, s_turn, s_div, key2, qq, pp, gg, llp, qsp, lpsp, gsp,
             lws, sacc, nl, _, _) = lax.while_loop(sub_cond, sub_body, sub0)
            key = key2

            # ---- merge the subtree into the trajectory ------------------ #
            ok = ~s_turn & ~s_div
            # biased progressive: take the subtree's proposal with
            # probability min(1, W_sub / W_total)
            key, kacc = jax.random.split(key)
            take = ok & (jnp.log(jax.random.uniform(kacc)) < lws - log_w)
            qp_ = jnp.where(take, qsp, qp_)
            lpp_ = jnp.where(take, lpsp, lpp_)
            gp_ = jnp.where(take, gsp, gp_)
            log_w = jnp.where(ok, jnp.logaddexp(log_w, lws), log_w)
            # advance the grown edge (only meaningful when the subtree
            # completed; a turning/diverged subtree ends the trajectory)
            grow_r = ok & (dirn > 0)
            grow_l = ok & (dirn < 0)
            qr = jnp.where(grow_r, qq, qr)
            pr = jnp.where(grow_r, pp, pr)
            gr = jnp.where(grow_r, gg, gr)
            lpr = jnp.where(grow_r, llp, lpr)
            ql = jnp.where(grow_l, qq, ql)
            pl = jnp.where(grow_l, pp, pl)
            gl = jnp.where(grow_l, gg, gl)
            lpl = jnp.where(grow_l, llp, lpl)
            whole_turn = ok & uturn(qr - ql, pl, pr)
            return (depth + 1, s_turn | whole_turn, s_div, key,
                    ql, pl, gl, lpl, qr, pr, gr, lpr,
                    qp_, lpp_, gp_, log_w,
                    s_acc + sacc, n_leaf + nl)

        s0 = (jnp.int32(0), jnp.bool_(False), jnp.bool_(False), key,
              q, p0, g, lp, q, p0, g, lp,
              q, lp, g, jnp.float64(0.0),
              jnp.float64(0.0), jnp.int32(0))
        out = lax.while_loop(outer_cond, outer_body, s0)
        (_, _, _, key, _, _, _, _, _, _, _, _,
         qp_, lpp_, gp_, _, s_acc, n_leaf) = out
        accept_stat = s_acc / jnp.maximum(n_leaf, 1)
        return qp_, lpp_, gp_, key, accept_stat

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
    algorithm: str = "hmc",
    max_tree_depth: int = 8,
) -> dict:
    """Adaptive Hamiltonian Monte Carlo over a differentiable log-density.

    ``logp(theta)`` must be a scalar, jittable, differentiable function of
    a ``(d,)`` parameter vector (:func:`observable_log_posterior` builds
    one from measured observables; any hand-written density works —
    including losses that run :func:`~inflatox_tpu.observables.solve_eom_fixed`
    inside).  ``x0`` ((d,) or (num_chains, d)) seeds the chains; with one
    row, chains start at ``x0`` plus N(0, ``jitter``²) scatter.

    Warmup (``num_warmup`` transitions total, split 3:1) adapts the step
    size by dual averaging (Hoffman & Gelman 2014, target acceptance
    ``target_accept``) under unit mass, estimates a diagonal mass matrix
    (inverse posterior variances) from that window's second half, then
    re-adapts the step size under the estimated mass; warmup and sampling
    each compile to one ``lax.scan`` with all chains vmapped.  A
    transition of L jittered leapfrog steps costs exactly L gradient
    evaluations (the state carries ∇logp).  ``mesh=`` shards the chain
    axis across all mesh axes (zero collectives in the kernel) — pad
    ``num_chains`` to a multiple of the mesh size.

    ``algorithm="nuts"`` (round 5) swaps the fixed-length kernel for the
    No-U-Turn sampler (:func:`_nuts_kernel`): trajectory lengths adapt per
    transition up to ``max_tree_depth`` doublings, ``num_leapfrog`` is
    ignored, and the same dual-averaging/mass-adaptation machinery drives
    the step size off the trajectory-mean acceptance statistic.

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
    if algorithm == "nuts":
        kernel = _nuts_kernel(logp_and_grad, int(max_tree_depth))
    elif algorithm == "hmc":
        kernel = _hmc_kernel(logp_and_grad, int(num_leapfrog))
    else:
        raise ValueError(
            f'algorithm must be "hmc" or "nuts", got {algorithm!r}')

    # dual-averaging constants (Hoffman & Gelman 2014, §3.2); warmup budget
    # splits 3:1 between the unit-mass window (mass estimated from its
    # second half) and the re-adaptation window under the estimated mass
    gamma, t0, kappa = 0.05, 10.0, 0.75
    p2 = max(1, int(num_warmup) // 4)
    p1 = int(num_warmup) - p2

    def warmup_step(inv_mass, mu):
        def step(state, i):
            q, lp, g, key, log_eps, log_eps_bar, h_bar = state
            key, sub = jax.random.split(key)
            subs = jax.random.split(sub, q.shape[0])
            q, lp, g, _, acc = jax.vmap(
                kernel, in_axes=(0, 0, 0, 0, None, None)
            )(q, lp, g, subs, jnp.exp(log_eps), inv_mass)
            # dual averaging on the chain-mean acceptance
            a = jnp.mean(acc)
            t = i + 1.0
            h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + (
                (float(target_accept) - a) / (t + t0)
            )
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            return (q, lp, g, key, log_eps, log_eps_bar, h_bar), (a, q)

        return step

    lp0, g0 = jax.vmap(logp_and_grad)(x0)

    @jax.jit
    def run_warmup(q, lp, g, key):
        # phase 1: dual-average the step size under unit mass, estimate the
        # diagonal mass from the second half; phase 2: re-adapt the step
        # size under the estimated mass (a step size tuned to one metric is
        # miscalibrated for another — Stan's windowed adaptation, two
        # windows).  Total transitions = num_warmup exactly.
        state = (q, lp, g, key, jnp.log(float(initial_step_size)),
                 jnp.log(float(initial_step_size)), 0.0)
        state, (accs1, qs) = lax.scan(
            warmup_step(jnp.ones(d), jnp.log(10.0 * float(initial_step_size))),
            state, jnp.arange(float(p1)),
        )
        q, lp, g, key, _, log_eps_bar, _ = state
        # floored — a parameter phase 1 never moved must not give a 0 mass
        var = jnp.maximum(
            jnp.var(qs[p1 // 2:].reshape(-1, q.shape[-1]), axis=0), 1e-12
        )
        eps1 = jnp.exp(log_eps_bar)
        # rescale the phase-1 step into the new metric as the starting
        # guess: proposal scale in q-space is ~ eps·√(inv_mass)
        eps_guess = eps1 / jnp.sqrt(jnp.max(var))
        state = (q, lp, g, key, jnp.log(eps_guess), jnp.log(eps_guess), 0.0)
        state, (accs2, _) = lax.scan(
            warmup_step(var, jnp.log(10.0 * eps_guess)),
            state, jnp.arange(float(p2)),
        )
        q, lp, g, key, _, log_eps_bar, _ = state
        return q, lp, g, key, jnp.exp(log_eps_bar), var, \
            jnp.concatenate([accs1, accs2])

    @jax.jit
    def run_sampling(q, lp, g, key, eps, inv_mass):
        def step(state, _):
            q, lp, g, key = state
            key, sub = jax.random.split(key)
            subs = jax.random.split(sub, q.shape[0])
            q, lp, g, _, acc = jax.vmap(
                kernel, in_axes=(0, 0, 0, 0, None, None)
            )(q, lp, g, subs, eps, inv_mass)
            return (q, lp, g, key), (q, lp, acc)

        (_, _, _, _), (qs, lps, accs) = lax.scan(
            step, (q, lp, g, key), None, length=int(num_samples)
        )
        return qs, lps, accs

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if x0.shape[0] % mesh.devices.size:
            raise ValueError(
                f"num_chains = {x0.shape[0]} must be a multiple of the "
                f"mesh size {mesh.devices.size}"
            )
        # shard the chain axis over EVERY mesh axis jointly — with a
        # multi-axis mesh a single-name spec leaves the array fully
        # replicated on the other axes (measured), defeating the sharding
        sh = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))
        x0 = jax.device_put(x0, sh)
        lp0 = jax.device_put(lp0, sh)
        g0 = jax.device_put(g0, sh)

    q, lp, g, key, eps, inv_mass, w_accs = run_warmup(x0, lp0, g0, key)
    qs, lps, accs = run_sampling(q, lp, g, key, eps, inv_mass)

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


def log_evidence_laplace(logp: Callable, samples) -> float:
    """Laplace-approximation log-evidence ln Z from posterior samples.

    Fits a Gaussian to the samples (pooled mean μ and covariance Σ) and
    evaluates

        ln Z ≈ logp(μ) + (d/2) ln 2π + ½ ln det Σ,

    exact when the posterior is Gaussian (asserted against the closed-form
    conjugate-Gaussian evidence in the suite) and the standard O(1/N)
    approximation otherwise — enough for Bayes-factor comparisons between
    inflationary models whose posteriors HMC has already mapped.  ``logp``
    must be the SAME (unnormalized) log-density that was sampled;
    ``samples`` is (chains, draws, d) from :func:`sample_posterior` (or
    any (N, d) array)."""
    s = np.asarray(samples, dtype=float).reshape(-1, np.shape(samples)[-1])
    mu = s.mean(axis=0)
    cov = np.atleast_2d(np.cov(s.T))
    d = s.shape[1]
    sign, logdet = np.linalg.slogdet(cov)
    if sign <= 0:
        raise ValueError(
            "posterior sample covariance is not positive definite — the "
            "chains have not explored (or a parameter is exactly pinned)"
        )
    lp_mu = float(jnp.asarray(logp(jnp.asarray(mu))))
    return lp_mu + 0.5 * d * np.log(2.0 * np.pi) + 0.5 * logdet


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
        # cap the lag sweep: a pathological (near-constant-drift) chain
        # would otherwise cost O(n²); past n/4 lags the estimator is
        # unreliable anyway and the partial sum already implies ESS ≪ n
        t = 1
        while t < min(n - 1, max(64, n // 4)):
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
