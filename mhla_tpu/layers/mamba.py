"""Mamba-1 layer (selective state space, S6).

Reference: ``mhla_nlp/fla/layers/mamba.py`` (the HF slow path; init schemes
:101-133) inside the shipped ``fla/models/mamba`` family. Projections:
``in_proj -> (x, z)``; depthwise causal conv (silu, bias); ``x_proj ->
(dt_low, B, C)``; ``dt = softplus(dt_proj(dt_low))``; diagonal SSM with
``A = -exp(A_log)`` and skip ``D``; ``out = out_proj(y * silu(z))``.

The scan runs through :mod:`mhla_tpu.ops.selective_scan` — chunked
associative scan for training/prefill, token recurrence for decode.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.selective_scan import selective_scan_chunk, selective_scan_recurrent
from .short_conv import ShortConvolution


class MambaState(NamedTuple):
    state: jax.Array  # [B, Dm, N]
    conv: Optional[jax.Array] = None  # [B, conv_size-1, Dm]


def _a_log_init(key, shape, dtype=jnp.float32):
    """S4D-real init: A[d, n] = n+1 (reference :96-97)."""
    del key
    dm, n = shape
    return jnp.log(jnp.broadcast_to(jnp.arange(1, n + 1, dtype=dtype), (dm, n)))


def _dt_proj_bias_init(time_step_min=0.001, time_step_max=0.1, floor=1e-4):
    """softplus(bias) log-uniform in [min, max] (reference :110-118)."""

    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, dtype)
            * (math.log(time_step_max) - math.log(time_step_min))
            + math.log(time_step_min)
        )
        dt = jnp.clip(dt, min=floor)
        return dt + jnp.log(-jnp.expm1(-dt))  # inverse softplus

    return init


class Mamba(nn.Module):
    hidden_size: int = 1024
    state_size: int = 16
    conv_size: int = 4
    expand: int = 2
    time_step_rank: Optional[int] = None  # default ceil(hidden/16)
    use_bias: bool = False
    use_conv_bias: bool = True
    chunk_size: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        state: Optional[MambaState] = None,
        use_cache: bool = False,
    ) -> Tuple[jax.Array, Optional[MambaState]]:
        b, t, _ = hidden_states.shape
        dm = self.expand * self.hidden_size
        n = self.state_size
        dt_rank = self.time_step_rank or math.ceil(self.hidden_size / 16)

        xz = nn.Dense(
            2 * dm, use_bias=self.use_bias, dtype=self.dtype, name="in_proj"
        )(hidden_states)
        x, z = jnp.split(xz, 2, axis=-1)

        x, conv = ShortConvolution(
            dm, self.conv_size, use_bias=self.use_conv_bias,
            activation="silu", dtype=self.dtype, name="conv1d",
        )(x, state.conv if state is not None else None, use_cache)

        ssm = nn.Dense(
            dt_rank + 2 * n, use_bias=False, dtype=self.dtype, name="x_proj"
        )(x)
        dt_low, b_in, c_in = jnp.split(ssm, [dt_rank, dt_rank + n], axis=-1)
        dt_std = dt_rank**-0.5  # reference "random" init: U(-std, std)
        dt = nn.Dense(
            dm, use_bias=True, dtype=self.dtype,
            kernel_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, -dt_std, dt_std
            ),
            bias_init=_dt_proj_bias_init(), name="dt_proj",
        )(dt_low)
        dt = jax.nn.softplus(dt.astype(jnp.float32))

        a_log = self.param("A_log", _a_log_init, (dm, n))
        d_skip = self.param("D", nn.initializers.ones, (dm,), jnp.float32)
        a = -jnp.exp(a_log)

        init_s = state.state if state is not None else None
        scan = (
            selective_scan_recurrent if t <= 8 else selective_scan_chunk
        )
        kwargs = {} if t <= 8 else {"chunk_size": self.chunk_size}
        y, s = scan(
            x, dt, a, b_in, c_in, d_skip,
            initial_state=init_s, output_final_state=use_cache, **kwargs,
        )

        y = y * jax.nn.silu(z)
        out = nn.Dense(
            self.hidden_size, use_bias=self.use_bias, dtype=self.dtype,
            name="out_proj",
        )(y)
        new_state = MambaState(state=s, conv=conv) if use_cache else None
        return out, new_state
