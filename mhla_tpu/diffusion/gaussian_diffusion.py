"""Gaussian diffusion (DDPM/IDDPM) + rectified-flow matching, jnp-native.

Functional re-design of the reference's OpenAI-ADM-derived stack
(``mhla_dit/diffusion/gaussian_diffusion.py`` for images,
``mhla_videogen/diffusion/model/gaussian_diffusion.py`` + scheduler wrappers
for video). Schedules and parameterizations covered:

- beta schedules: ``linear`` (scaled DDPM), ``squaredcos_cap_v2`` (iDDPM)
- model mean types: EPSILON (DiT default), START_X, FLOW_VELOCITY
  (video flow matching: target = noise - x_start with the ``linear_flow``
  schedule, reference ``gaussian_diffusion.py:830,:142``)
- variance: fixed small/large or LEARNED_RANGE (DiT ``learn_sigma``)
- losses: MSE (+ vb term for learned range, reference ``training_losses:715``)
- sampling: ancestral ``p_sample_loop`` and ``ddim_sample_loop`` as
  ``lax.scan`` bodies (the 250-step python loop becomes one XLA program),
  with uniform timestep respacing (``respace.py``).

Everything is shape-static and jit-friendly; the model callable signature is
``model(x_t, t_continuous_or_index, **cond) -> prediction``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(
            scale * 1e-4, scale * 0.02, num_steps, dtype=np.float64
        )
    if name == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1 - alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps), 0.999)
            for i in range(num_steps)
        ]
        return np.asarray(betas, dtype=np.float64)
    raise ValueError(f"unknown beta schedule {name}")


def space_timesteps(num_timesteps: int, count: int) -> np.ndarray:
    """Uniformly respaced timestep subset (reference ``respace.py`` with a
    single section, e.g. '250')."""
    frac = num_timesteps / count
    cur, taken = 0.0, []
    for _ in range(count):
        taken.append(round(cur))
        cur += frac
    return np.asarray(sorted(set(taken)), dtype=np.int64)


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    betas: Tuple[float, ...]
    mean_type: str = "epsilon"  # epsilon | x_start | velocity (flow)
    var_type: str = "learned_range"  # fixed_small | fixed_large | learned_range

    # ---- derived quantities (cached numpy) -------------------------------
    def _np(self) -> Dict[str, np.ndarray]:
        betas = np.asarray(self.betas, dtype=np.float64)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        return dict(
            betas=betas,
            alphas_cumprod=acp,
            alphas_cumprod_prev=acp_prev,
            sqrt_acp=np.sqrt(acp),
            sqrt_om_acp=np.sqrt(1.0 - acp),
            sqrt_recip_acp=np.sqrt(1.0 / acp),
            sqrt_recipm1_acp=np.sqrt(1.0 / acp - 1.0),
            posterior_variance=post_var,
            posterior_log_var_clipped=np.log(np.append(post_var[1], post_var[1:])),
            posterior_mean_c0=betas * np.sqrt(acp_prev) / (1.0 - acp),
            posterior_mean_ct=(1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp),
        )

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    # ---- forward process --------------------------------------------------
    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        c = self._np()
        return (
            _gather(c["sqrt_acp"], t, x0.ndim) * x0
            + _gather(c["sqrt_om_acp"], t, x0.ndim) * noise
        )

    # ---- training ---------------------------------------------------------
    def training_losses(
        self,
        model: Callable,
        x0: jax.Array,
        t: jax.Array,
        rng: jax.Array,
        model_kwargs: Optional[dict] = None,
    ) -> Dict[str, jax.Array]:
        model_kwargs = model_kwargs or {}
        noise = jax.random.normal(rng, x0.shape, x0.dtype)
        x_t = self.q_sample(x0, t, noise)
        out = model(x_t, t, **model_kwargs)

        c = x0.shape[-1]
        vb = None
        if self.var_type == "learned_range":
            pred, var_raw = out[..., :c], out[..., c:]
            vb = self._vb_term(pred, var_raw, x0, x_t, t)
            out = pred

        if self.mean_type == "epsilon":
            target = noise
        elif self.mean_type == "x_start":
            target = x0
        elif self.mean_type == "velocity":
            target = noise - x0  # flow velocity (reference :830)
        else:
            raise ValueError(self.mean_type)
        mse = jnp.mean(
            jnp.square(out.astype(jnp.float32) - target.astype(jnp.float32)),
            axis=tuple(range(1, x0.ndim)),
        )
        losses = {"mse": mse, "loss": mse + (vb if vb is not None else 0.0)}
        if vb is not None:
            losses["vb"] = vb
        return losses

    def _vb_term(self, eps_pred, var_raw, x0, x_t, t):
        """KL between true posterior and model posterior with learned-range
        variance; the mean is frozen (stop_gradient) as in the reference so
        vb only trains the variance head."""
        cst = self._np()
        true_mean = (
            _gather(cst["posterior_mean_c0"], t, x0.ndim) * x0
            + _gather(cst["posterior_mean_ct"], t, x0.ndim) * x_t
        )
        true_logvar = _gather(cst["posterior_log_var_clipped"], t, x0.ndim)
        mean, logvar = self._p_mean_logvar(
            jax.lax.stop_gradient(eps_pred), var_raw, x_t, t
        )
        kl = 0.5 * (
            -1.0
            + logvar
            - true_logvar
            + jnp.exp(true_logvar - logvar)
            + jnp.square(true_mean - mean) * jnp.exp(-logvar)
        )
        return jnp.mean(kl, axis=tuple(range(1, x0.ndim))) / math.log(2.0)

    # ---- reverse process ---------------------------------------------------
    def predict_x0(self, model_out: jax.Array, x_t: jax.Array, t: jax.Array):
        c = self._np()
        if self.mean_type == "epsilon":
            return (
                _gather(c["sqrt_recip_acp"], t, x_t.ndim) * x_t
                - _gather(c["sqrt_recipm1_acp"], t, x_t.ndim) * model_out
            )
        if self.mean_type == "x_start":
            return model_out
        if self.mean_type == "velocity":
            # x0 = x_t - sigma(t) * v under linear flow; for the DDPM-grid
            # formulation recover eps = (v + x0)... use eps = v + x0 =>
            # x0 = (x_t - sqrt(1-acp) * v) with linear-flow coefficients.
            sig = _gather(c["sqrt_om_acp"], t, x_t.ndim)
            alp = _gather(c["sqrt_acp"], t, x_t.ndim)
            # v = eps - x0 and x_t = alp*x0 + sig*eps  =>  x0 = (x_t - sig*v)/(alp+sig)
            return (x_t - sig * model_out) / (alp + sig)
        raise ValueError(self.mean_type)

    def _p_mean_logvar(self, model_out, var_raw, x_t, t, clip: bool = True):
        c = self._np()
        if self.var_type == "learned_range":
            min_log = _gather(c["posterior_log_var_clipped"], t, x_t.ndim)
            max_log = _gather(np.log(c["betas"]), t, x_t.ndim)
            frac = (var_raw.astype(jnp.float32) + 1) / 2
            logvar = frac * max_log + (1 - frac) * min_log
        elif self.var_type == "fixed_small":
            logvar = _gather(c["posterior_log_var_clipped"], t, x_t.ndim)
        else:  # fixed_large
            logvar = _gather(
                np.log(np.append(c["posterior_variance"][1], c["betas"][1:])),
                t,
                x_t.ndim,
            )
        x0 = self.predict_x0(model_out.astype(jnp.float32), x_t, t)
        if clip:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (
            _gather(c["posterior_mean_c0"], t, x_t.ndim) * x0
            + _gather(c["posterior_mean_ct"], t, x_t.ndim) * x_t
        )
        return mean, logvar

    def p_sample_loop(
        self,
        model: Callable,
        shape: Sequence[int],
        rng: jax.Array,
        model_kwargs: Optional[dict] = None,
        timestep_map: Optional[np.ndarray] = None,
        clip_denoised: bool = True,
    ) -> jax.Array:
        """Ancestral sampling as one lax.scan program (reference
        ``p_sample_loop`` :419, the 250x hot loop of DiT sampling)."""
        model_kwargs = model_kwargs or {}
        sub = self._respaced(timestep_map)
        n = sub.num_timesteps
        t_map = jnp.asarray(
            timestep_map
            if timestep_map is not None
            else np.arange(self.num_timesteps),
            jnp.int32,
        )
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, tuple(shape), jnp.float32)

        def body(x, args):
            i, step_rng = args  # i: respaced index from n-1 downto 0
            t_model = jnp.full((shape[0],), t_map[i], jnp.int32)
            t_sub = jnp.full((shape[0],), i, jnp.int32)
            out = model(x, t_model, **model_kwargs)
            c = shape[-1]
            if sub.var_type == "learned_range":
                pred, var_raw = out[..., :c], out[..., c:]
            else:
                pred, var_raw = out, None
            mean, logvar = sub._p_mean_logvar(pred, var_raw, x, t_sub, clip_denoised)
            noise = jax.random.normal(step_rng, x.shape, x.dtype)
            nonzero = (i != 0).astype(x.dtype)
            x = mean + nonzero * jnp.exp(0.5 * logvar) * noise
            return x, None

        idxs = jnp.arange(n - 1, -1, -1)
        rngs = jax.random.split(rng, n)
        x, _ = jax.lax.scan(body, x, (idxs, rngs))
        return x

    def ddim_sample_loop(
        self,
        model: Callable,
        shape: Sequence[int],
        rng: jax.Array,
        model_kwargs: Optional[dict] = None,
        timestep_map: Optional[np.ndarray] = None,
        eta: float = 0.0,
        clip_denoised: bool = True,
    ) -> jax.Array:
        model_kwargs = model_kwargs or {}
        sub = self._respaced(timestep_map)
        n = sub.num_timesteps
        t_map = jnp.asarray(
            timestep_map
            if timestep_map is not None
            else np.arange(self.num_timesteps),
            jnp.int32,
        )
        c_np = sub._np()
        acp = jnp.asarray(c_np["alphas_cumprod"], jnp.float32)
        acp_prev = jnp.asarray(c_np["alphas_cumprod_prev"], jnp.float32)
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, tuple(shape), jnp.float32)

        def body(x, args):
            i, step_rng = args
            t_model = jnp.full((shape[0],), t_map[i], jnp.int32)
            t_sub = jnp.full((shape[0],), i, jnp.int32)
            out = model(x, t_model, **model_kwargs)
            ch = shape[-1]
            pred = out[..., :ch] if sub.var_type == "learned_range" else out
            x0 = sub.predict_x0(pred.astype(jnp.float32), x, t_sub)
            if clip_denoised:
                x0 = jnp.clip(x0, -1, 1)
            a_t = _gather_j(acp, t_sub, x.ndim)
            a_prev = _gather_j(acp_prev, t_sub, x.ndim)
            eps = (jnp.sqrt(1.0 / a_t) * x - x0) / jnp.sqrt(1.0 / a_t - 1)
            sigma = (
                eta
                * jnp.sqrt((1 - a_prev) / (1 - a_t))
                * jnp.sqrt(1 - a_t / a_prev)
            )
            noise = jax.random.normal(step_rng, x.shape, x.dtype)
            mean = (
                jnp.sqrt(a_prev) * x0
                + jnp.sqrt(1 - a_prev - sigma**2) * eps
            )
            nonzero = (i != 0).astype(x.dtype)
            return mean + nonzero * sigma * noise, None

        idxs = jnp.arange(n - 1, -1, -1)
        rngs = jax.random.split(rng, n)
        x, _ = jax.lax.scan(body, x, (idxs, rngs))
        return x

    def _respaced(self, timestep_map: Optional[np.ndarray]) -> "GaussianDiffusion":
        """Diffusion over the respaced beta subsequence (``respace.py``)."""
        if timestep_map is None:
            return self
        c = self._np()
        acp = c["alphas_cumprod"][timestep_map]
        acp_prev = np.append(1.0, acp[:-1])
        new_betas = 1.0 - acp / acp_prev
        return GaussianDiffusion(
            betas=tuple(new_betas.tolist()),
            mean_type=self.mean_type,
            var_type=self.var_type,
        )


def _gather(table: np.ndarray, t: jax.Array, ndim: int) -> jax.Array:
    out = jnp.asarray(table, jnp.float32)[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def _gather_j(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def create_diffusion(
    timestep_respacing: Optional[str] = None,
    noise_schedule: str = "linear",
    diffusion_steps: int = 1000,
    learn_sigma: bool = True,
    mean_type: str = "epsilon",
) -> Tuple[GaussianDiffusion, Optional[np.ndarray]]:
    """Reference ``create_diffusion`` analogue (``diffusion/__init__.py:10-46``).
    Returns (diffusion, timestep_map) — pass the map to the sample loops."""
    betas = make_beta_schedule(noise_schedule, diffusion_steps)
    diff = GaussianDiffusion(
        betas=tuple(betas.tolist()),
        mean_type=mean_type,
        var_type="learned_range" if learn_sigma else "fixed_small",
    )
    t_map = None
    if timestep_respacing:
        t_map = space_timesteps(diffusion_steps, int(timestep_respacing))
    return diff, t_map


# ---------------------------------------------------------------------------
# Rectified flow matching (video path)
# ---------------------------------------------------------------------------

def flow_q_sample(x0: jax.Array, t01: jax.Array, noise: jax.Array) -> jax.Array:
    """Linear-flow interpolation x_t = (1-t) x0 + t eps, t in [0, 1]
    (reference ``linear_flow`` schedule, ``gaussian_diffusion.py:142``)."""
    t = t01.reshape(t01.shape + (1,) * (x0.ndim - 1))
    return (1 - t) * x0 + t * noise


def flow_training_loss(
    model: Callable,
    x0: jax.Array,
    t01: jax.Array,
    rng: jax.Array,
    model_kwargs: Optional[dict] = None,
) -> Dict[str, jax.Array]:
    """Flow-velocity MSE: target = noise - x_start (reference :830)."""
    model_kwargs = model_kwargs or {}
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    x_t = flow_q_sample(x0, t01, noise)
    v = model(x_t, t01, **model_kwargs)
    target = noise - x0
    mse = jnp.mean(
        jnp.square(v.astype(jnp.float32) - target.astype(jnp.float32)),
        axis=tuple(range(1, x0.ndim)),
    )
    return {"loss": mse, "mse": mse}


def logit_normal_timesteps(
    rng: jax.Array, batch: int, mean: float = 0.0, std: float = 1.0
) -> jax.Array:
    """Logit-normal t in (0,1) (reference ``train_wan.py:625-635`` /
    ``compute_density_for_timestep_sampling``)."""
    u = jax.random.normal(rng, (batch,)) * std + mean
    return jax.nn.sigmoid(u)


def flow_euler_sample_loop(
    model: Callable,
    shape: Sequence[int],
    rng: jax.Array,
    num_steps: int = 50,
    model_kwargs: Optional[dict] = None,
    shift: float = 1.0,
) -> jax.Array:
    """FlowEuler sampler (reference ``flow_euler_sampler.py:29``): integrate
    dx/dt = -v from t=1 (noise) to t=0, with optional timestep shift
    t' = shift*t / (1 + (shift-1)*t)."""
    model_kwargs = model_kwargs or {}
    x = jax.random.normal(rng, tuple(shape), jnp.float32)
    ts = np.linspace(1.0, 0.0, num_steps + 1)
    if shift != 1.0:
        ts = shift * ts / (1 + (shift - 1) * ts)
    ts = jnp.asarray(ts, jnp.float32)

    def body(x, i):
        t_cur, t_next = ts[i], ts[i + 1]
        t_b = jnp.full((shape[0],), t_cur, jnp.float32)
        v = model(x, t_b, **model_kwargs)
        return x + (t_next - t_cur) * v.astype(jnp.float32), None

    x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
    return x
