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


class TestLCM:
    def test_timestep_schedule_matches_reference_formula(self):
        """Reference set_timesteps (lcm_scheduler.py:287-311)."""
        from mhla_tpu.diffusion import lcm_timesteps

        n_inf, origin, n_train = 4, 50, 1000
        c = n_train // origin
        origin_ts = np.asarray(list(range(1, origin + 1))) * c - 1
        skip = len(origin_ts) // n_inf
        expect = origin_ts[::-skip][:n_inf]
        np.testing.assert_array_equal(lcm_timesteps(n_inf, origin, n_train), expect)

    def test_boundary_scalings(self):
        from mhla_tpu.diffusion.lcm import lcm_boundary_scalings

        t = jnp.asarray(999.0)
        c_skip, c_out = lcm_boundary_scalings(t)
        ts = 999.0 / 0.1
        np.testing.assert_allclose(float(c_skip), 0.25 / (ts**2 + 0.25), rtol=1e-6)
        np.testing.assert_allclose(
            float(c_out), ts / np.sqrt(ts**2 + 0.25), rtol=1e-6
        )
        # t=0 boundary: identity (c_skip=1, c_out=0)
        c_skip0, c_out0 = lcm_boundary_scalings(jnp.asarray(0.0))
        assert float(c_skip0) == pytest.approx(1.0)
        assert float(c_out0) == pytest.approx(0.0)

    def test_one_step_consistency_model_recovers_x0(self, key):
        """A perfect epsilon model + one LCM step lands near x0: at large t,
        c_skip ~ 0 and c_out ~ 1, so denoised ~ pred_x0."""
        from mhla_tpu.diffusion import lcm_sample_loop

        x0 = jnp.full((2, 8), 0.9)
        noise = jax.random.normal(key, (2, 8))
        betas = (
            np.linspace(0.0001**0.5, 0.02**0.5, 1000, dtype=np.float64) ** 2
        )
        acp = np.cumprod(1 - betas)

        def eps_model(x, t_b):
            a = jnp.asarray(acp, jnp.float32)[t_b]
            a = a.reshape(-1, 1)
            # x = sqrt(a) x0 + sqrt(1-a) eps  =>  eps = (x - sqrt(a) x0)/sqrt(1-a)
            return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

        out = lcm_sample_loop(
            eps_model, (2, 8), key, num_steps=1, noise=noise
        )
        np.testing.assert_allclose(np.asarray(out), 0.9, atol=2e-2)

    def test_multistep_shapes_and_finiteness(self, key):
        from mhla_tpu.diffusion import lcm_sample_loop

        model = lambda x, t: 0.1 * x  # noqa: E731
        out = lcm_sample_loop(model, (2, 4, 4), key, num_steps=4)
        assert out.shape == (2, 4, 4)
        assert bool(jnp.isfinite(out).all())


class TestFlowEulerVariants:
    def _linear_velocity_model(self):
        # v = eps - x0 with x0 = 0 known: optimal v(x_t, t) = x_t / t
        def model(x, t_frames, **kw):
            tt = jnp.clip(t_frames, 1e-6)[:, None, :, None, None]
            return x / tt

        return model

    def test_ltx_no_conditioning_matches_plain(self, key):
        """Zero conditioning mask == plain FlowEuler on the same latents."""
        from mhla_tpu.diffusion import ltx_flow_euler_sample_loop
        from mhla_tpu.diffusion import flow_euler_sample_loop

        shape = (1, 2, 3, 4, 4)
        noise = jax.random.normal(key, shape)
        model = self._linear_velocity_model()
        out = ltx_flow_euler_sample_loop(
            model, noise, key, num_steps=8, shift=1.0
        )

        def scalar_model(x, t_b, **kw):
            t_frames = jnp.broadcast_to(t_b[:, None], (x.shape[0], x.shape[2]))
            return model(x, t_frames)

        # plain loop draws its own noise from the same key
        ref = flow_euler_sample_loop(
            scalar_model, shape, key, num_steps=8, shift=1.0
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_ltx_conditioning_frames_preserved(self, key):
        from mhla_tpu.diffusion import ltx_flow_euler_sample_loop

        shape = (1, 2, 4, 2, 2)
        latents = jax.random.normal(key, shape)
        mask = jnp.zeros(shape).at[:, :, 0].set(1.0)  # frame 0 conditions
        model = self._linear_velocity_model()
        out = ltx_flow_euler_sample_loop(
            model, latents, key, num_steps=6, condition_mask=mask,
            noise_scale=0.0, shift=1.0,
        )
        # conditioning frame unchanged; others moved
        np.testing.assert_allclose(
            np.asarray(out[:, :, 0]), np.asarray(latents[:, :, 0]), atol=1e-6
        )
        assert not np.allclose(np.asarray(out[:, :, 1]), np.asarray(latents[:, :, 1]))

    def test_chunk_single_chunk_matches_ltx(self, key):
        from mhla_tpu.diffusion import (
            chunk_flow_euler_sample_loop,
            ltx_flow_euler_sample_loop,
        )

        shape = (1, 2, 4, 2, 2)
        latents = jax.random.normal(key, shape)
        model = self._linear_velocity_model()
        a = chunk_flow_euler_sample_loop(
            model, latents, key, num_steps=6, chunk_index=[0], shift=1.0
        )
        b = ltx_flow_euler_sample_loop(
            model, latents, key, num_steps=6, noise_scale=0.0, shift=1.0
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_chunk_staggered_denoises_all_chunks(self, key):
        """Two chunks, staggered: both must end fully denoised (a perfect
        v-model for x0=0 drives every frame to ~0 at t=0)."""
        from mhla_tpu.diffusion import chunk_flow_euler_sample_loop

        shape = (1, 2, 6, 2, 2)
        latents = jax.random.normal(key, shape)
        model = self._linear_velocity_model()
        out = chunk_flow_euler_sample_loop(
            model, latents, key, num_steps=16, chunk_index=[0, 3],
            interval_k=0.5, shift=1.0,
        )
        # exact integration of dx/dt = x/t from 1 to ~0 drives x to ~0
        assert float(jnp.max(jnp.abs(out))) < 0.2

    def test_chunk_starts_passed_to_model(self, key):
        from mhla_tpu.diffusion import chunk_flow_euler_sample_loop

        seen = []

        def model(x, t_frames, chunk_starts=None, **kw):
            seen.append((x.shape[2], chunk_starts))
            return jnp.zeros_like(x)

        latents = jnp.zeros((1, 1, 6, 2, 2))
        chunk_flow_euler_sample_loop(
            model, latents, key, num_steps=4, chunk_index=[0, 3],
            interval_k=0.5, pass_chunk_starts=True, shift=1.0,
        )
        frame_counts = sorted(set(s[0] for s in seen))
        assert frame_counts == [3, 6]  # stage 1: chunk 0 only; stage 2: both
        assert (6, (0, 3)) in seen
