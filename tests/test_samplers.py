"""UniPC / SA-Solver sampler tests.

Oracle strategy: on a Gaussian toy distribution the posterior-mean data
prediction is closed-form, so every ODE sampler must converge to the same
probability-flow endpoint — a many-step DPM-Solver++(2M) run is the
reference trajectory (the VERDICT-prescribed 'agree with DPM-Solver++'
check). Constant-x0 models make all exponential-integrator updates exact,
giving a machine-precision invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.diffusion import sa_solver_sample, unipc_sample
from mhla_tpu.diffusion.dpm_solver import dpm_solver_pp
from mhla_tpu.diffusion.gaussian_diffusion import make_beta_schedule


def gaussian_x0_model(mu=1.5, s2=0.25):
    """Optimal data prediction for x0 ~ N(mu, s2) under rectified flow."""

    def model(x_t, t):
        tt = t.reshape(t.shape + (1,) * (x_t.ndim - 1))
        a = 1.0 - tt
        gain = a * s2 / (a**2 * s2 + tt**2)
        return mu + gain * (x_t - a * mu)

    return model


def gaussian_x0_model_vp(alphas_cumprod, mu=1.5, s2=0.25):
    """Same oracle for a discrete VP schedule (x_t = a x0 + sig eps)."""
    n = alphas_cumprod.shape[0]
    grid = jnp.asarray(np.arange(1, n + 1) / n, jnp.float32)
    log_alpha = jnp.asarray(
        0.5 * np.log(np.clip(alphas_cumprod, 1e-7, None)), jnp.float32
    )

    def model(x_t, t):
        la = jnp.interp(t, grid, log_alpha)
        a = jnp.exp(la).reshape(t.shape + (1,) * (x_t.ndim - 1))
        sg = jnp.sqrt(jnp.clip(1.0 - a**2, 1e-7))
        gain = a * s2 / (a**2 * s2 + sg**2)
        return mu + gain * (x_t - a * mu)

    return model


class TestExactness:
    """Constant x0 -> every update is exact: endpoint = c + t_end * noise."""

    def test_unipc_constant_model(self, key):
        c = 0.7
        model = lambda x_t, t: jnp.full_like(x_t, c)  # noqa: E731
        x1 = jax.random.normal(key, (2, 8))
        out = unipc_sample(model, x1, num_steps=6, order=2)
        np.testing.assert_allclose(np.asarray(out), c, atol=5e-3)

    def test_sa_solver_constant_model(self, key):
        c = -0.3
        model = lambda x_t, t: jnp.full_like(x_t, c)  # noqa: E731
        x1 = jax.random.normal(key, (2, 8))
        out = sa_solver_sample(model, x1, num_steps=6, eta=0.0)
        np.testing.assert_allclose(np.asarray(out), c, atol=5e-3)


class TestAgainstDPMSolver:
    def _reference(self, x1, shift=1.0):
        return np.asarray(
            dpm_solver_pp(gaussian_x0_model(), x1, num_steps=400, shift=shift)
        )

    def test_unipc_matches_dpmpp(self, key):
        x1 = jax.random.normal(key, (4, 16))
        ref = self._reference(x1)
        out = np.asarray(unipc_sample(gaussian_x0_model(), x1, num_steps=25))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 5e-3, rel

    def test_unipc_shifted_grid(self, key):
        x1 = jax.random.normal(key, (4, 16))
        ref = self._reference(x1, shift=3.0)
        out = np.asarray(
            unipc_sample(gaussian_x0_model(), x1, num_steps=25, shift=3.0)
        )
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 5e-3, rel

    def test_unipc_order3(self, key):
        x1 = jax.random.normal(key, (4, 16))
        ref = self._reference(x1)
        out = np.asarray(
            unipc_sample(gaussian_x0_model(), x1, num_steps=25, order=3)
        )
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 5e-3, rel

    def test_unipc_corrector_improves(self, key):
        x1 = jax.random.normal(key, (4, 16))
        ref = self._reference(x1)
        few = lambda corr: np.linalg.norm(  # noqa: E731
            np.asarray(
                unipc_sample(
                    gaussian_x0_model(), x1, num_steps=6, use_corrector=corr
                )
            )
            - ref
        )
        assert few(True) < few(False)

    def test_sa_solver_ode_matches_dpmpp(self, key):
        x1 = jax.random.normal(key, (4, 16))
        ref = self._reference(x1)
        out = np.asarray(
            sa_solver_sample(gaussian_x0_model(), x1, num_steps=50, eta=0.0)
        )
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 2e-3, rel

    def test_unipc_converges_with_steps(self, key):
        x1 = jax.random.normal(key, (4, 16))
        ref = self._reference(x1)
        errs = [
            np.linalg.norm(
                np.asarray(unipc_sample(gaussian_x0_model(), x1, num_steps=n))
                - ref
            )
            for n in (5, 10, 40)
        ]
        assert errs[0] > errs[1] > errs[2]


class TestStochastic:
    def test_sde_samples_target_distribution(self, key):
        mu, s2 = 1.5, 0.25
        x1 = jax.random.normal(key, (2048, 1))
        out = np.asarray(
            sa_solver_sample(
                gaussian_x0_model(mu, s2), x1, num_steps=25, eta=0.6,
                rng=jax.random.PRNGKey(7),
            )
        )
        assert abs(out.mean() - mu) < 0.08
        assert abs(out.std() - np.sqrt(s2)) < 0.08

    def test_eta_zero_is_deterministic(self, key):
        x1 = jax.random.normal(key, (4, 8))
        a = sa_solver_sample(
            gaussian_x0_model(), x1, num_steps=8, eta=0.0,
            rng=jax.random.PRNGKey(0),
        )
        b = sa_solver_sample(
            gaussian_x0_model(), x1, num_steps=8, eta=0.0,
            rng=jax.random.PRNGKey(99),
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestDiscreteSchedule:
    def test_sa_solver_vp_schedule(self, key):
        """DDPM linear-beta schedule (the reference DiT usage)."""
        betas = make_beta_schedule("linear", 1000)
        acp = np.cumprod(1.0 - np.asarray(betas))
        ts = np.linspace(1.0, 1.0 / 1000, 26)
        model = gaussian_x0_model_vp(acp)
        x1 = jax.random.normal(key, (512, 1))
        out = np.asarray(
            sa_solver_sample(
                model, x1, num_steps=25, eta=0.0, ts=ts, alphas_cumprod=acp
            )
        )
        assert np.isfinite(out).all()
        assert abs(out.mean() - 1.5) < 0.1
