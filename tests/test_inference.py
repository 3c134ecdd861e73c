"""Gradient-based Bayesian inference (inflatox_tpu.inference).

Validation strategy: the adaptive HMC sampler must reproduce a known
correlated Gaussian to sampling accuracy, and — the loop-closing physics
test — the sampled posterior over model parameters given (n_s, r)
pseudo-data must match the analytic Fisher/Cramér–Rao forecast of
:func:`inflatox_tpu.observables.fisher_matrix` (same likelihood, same
point, two independent computations: autodiff Jacobians vs MCMC)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inflatox_tpu import inference, observables

X = np.array([14.0, 6.0])
THETA = np.array([1.0, 0.7])
PRIOR_SIG = 0.05


def test_hmc_recovers_correlated_gaussian():
    cov = np.array([[1.0, 0.6, 0.0], [0.6, 2.0, 0.3], [0.0, 0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.array([1.0, -2.0, 0.5])

    def logp(q):
        r = q - mean
        return -0.5 * r @ prec @ r

    out = inference.sample_posterior(
        logp, np.zeros(3), num_samples=2000, num_warmup=800,
        num_chains=4, num_leapfrog=24, seed=1,
    )
    s = out["samples"].reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.08)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.25)
    assert np.all(out["r_hat"] < 1.02)
    assert np.all(out["ess"] > 200)
    assert out["accept_rate"].mean() > 0.6


def test_nuts_recovers_correlated_gaussian():
    """The NUTS kernel (round 5) must reproduce the same correlated
    Gaussian as HMC — same target, adaptive trajectory lengths."""
    cov = np.array([[1.0, 0.6, 0.0], [0.6, 2.0, 0.3], [0.0, 0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.array([1.0, -2.0, 0.5])

    def logp(q):
        r = q - mean
        return -0.5 * r @ prec @ r

    out = inference.sample_posterior(
        logp, np.zeros(3), num_samples=1500, num_warmup=600,
        num_chains=4, seed=2, algorithm="nuts", max_tree_depth=7,
    )
    s = out["samples"].reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.08)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.25)
    assert np.all(out["r_hat"] < 1.02)
    assert np.all(out["ess"] > 200)
    assert out["accept_rate"].mean() > 0.5


def test_nuts_handles_anisotropic_scales():
    """A 100:1 scale ratio: NUTS's adaptive trajectory length + the
    warmup mass matrix must still mix every direction (fixed-L HMC with
    too-short trajectories under-mixes the wide direction)."""
    sig = jnp.asarray([10.0, 0.1])

    def logp(q):
        return -0.5 * jnp.sum((q / sig) ** 2)

    out = inference.sample_posterior(
        logp, np.array([1.0, 0.1]), num_samples=1500, num_warmup=600,
        num_chains=4, seed=4, algorithm="nuts", max_tree_depth=8,
    )
    s = out["samples"].reshape(-1, 2)
    np.testing.assert_allclose(s.std(0), np.asarray(sig), rtol=0.15)
    assert np.all(out["r_hat"] < 1.05)
    assert np.all(out["ess"] > 150)


def test_nuts_bad_algorithm_raises():
    with pytest.raises(ValueError, match="algorithm"):
        inference.sample_posterior(lambda q: -q @ q, np.zeros(2),
                                   algorithm="mala")


def test_posterior_matches_fisher_forecast(trivial_artifact):
    """MCMC posterior covariance vs the Cramér–Rao forecast — two
    independent routes to the same constraint (the prior term kills the
    overall-rescaling direction all slow-roll observables are blind to)."""
    art = trivial_artifact
    sr = observables.slow_roll(art)(jnp.asarray(X), jnp.asarray(THETA))
    data = {"n_s": float(sr["n_s"]), "r": float(sr["r"])}
    sigma = {"n_s": 0.004, "r": 0.01}

    def prior(th):
        return -0.5 * jnp.sum(((th - THETA) / PRIOR_SIG) ** 2)

    logp = inference.observable_log_posterior(art, X, data, sigma,
                                              prior=prior)
    out = inference.sample_posterior(
        logp, THETA, num_samples=3000, num_warmup=1000,
        num_chains=4, num_leapfrog=24, seed=3,
    )
    s = out["samples"].reshape(-1, 2)
    f = observables.fisher_matrix(
        art, X, THETA, np.array([sigma["n_s"], sigma["r"]])
    )
    cov_pred = np.linalg.inv(f + np.eye(2) / PRIOR_SIG**2)
    # 4 standard errors of the posterior mean (σ ≈ 0.05, N_eff ≳ 2000)
    np.testing.assert_allclose(s.mean(0), THETA, atol=5e-3)
    np.testing.assert_allclose(np.diag(np.cov(s.T)), np.diag(cov_pred),
                               rtol=0.15)
    assert np.all(out["r_hat"] < 1.02)


def test_sample_posterior_sharded_chains(trivial_artifact):
    """The chain axis shards across the mesh (zero collectives in the
    kernel; the dual-averaging mean is the one cross-chain reduction)."""
    from inflatox_tpu.parallel import make_mesh

    mesh = make_mesh()
    n = mesh.devices.size

    def logp(q):
        return -0.5 * jnp.sum(q * q)

    out = inference.sample_posterior(
        logp, np.zeros(2), num_samples=500, num_warmup=300,
        num_chains=n, num_leapfrog=16, seed=7, mesh=mesh,
    )
    s = out["samples"].reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(s.var(0), 1.0, atol=0.2)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        inference.sample_posterior(
            logp, np.zeros(2), num_samples=10, num_warmup=10,
            num_chains=n + 1, num_leapfrog=4, mesh=mesh,
        )


def test_inference_error_paths(trivial_artifact):
    with pytest.raises(ValueError, match="sigma missing"):
        inference.observable_log_posterior(
            trivial_artifact, X, {"n_s": 0.96}, {}
        )
    with pytest.raises(ValueError, match="target_accept"):
        inference.sample_posterior(lambda q: -q @ q, np.zeros(2),
                                   target_accept=1.5)
    with pytest.raises(ValueError, match="num_chains"):
        inference.sample_posterior(
            lambda q: -q @ q, np.zeros((3, 2)), num_chains=4,
            num_samples=10, num_warmup=10,
        )


def test_log_evidence_laplace_exact_on_gaussian():
    """For a Gaussian likelihood N(data; θ, σ²) with prior N(θ; 0, τ²)
    the evidence is the closed-form convolution N(data; 0, σ² + τ²) —
    Laplace is exact there, so the sampled estimate must land on it."""
    data, sig, tau = 0.7, 0.3, 1.5

    def logp(q):
        return (
            -0.5 * ((data - q[0]) / sig) ** 2
            - np.log(sig * np.sqrt(2 * np.pi))
            - 0.5 * (q[0] / tau) ** 2
            - np.log(tau * np.sqrt(2 * np.pi))
        )

    out = inference.sample_posterior(
        logp, np.zeros(1), num_samples=4000, num_warmup=600,
        num_chains=4, num_leapfrog=8, seed=5,
    )
    ln_z = inference.log_evidence_laplace(logp, out["samples"])
    v = sig**2 + tau**2
    ln_z_exact = -0.5 * data**2 / v - 0.5 * np.log(2 * np.pi * v)
    np.testing.assert_allclose(ln_z, ln_z_exact, atol=0.02)
    with pytest.raises(ValueError, match="positive definite"):
        inference.log_evidence_laplace(logp, np.zeros((2, 10, 1)))


def test_diagnostics_shapes():
    rng = np.random.default_rng(0)
    s = rng.normal(size=(4, 400, 3))
    rh = inference.r_hat(s)
    ess = inference.effective_sample_size(s)
    assert rh.shape == (3,) and np.all(rh < 1.05)
    # independent draws: ESS ≈ the sample count
    assert np.all(ess > 0.5 * 4 * 400)
