"""BitLinear (1.58-bit QAT linear) and FFT long convolutions.

Golden anchors are transcriptions of the reference formulas
(``mhla_nlp/fla/modules/fused_bitlinear.py:26-66`` quantizers + the
BitLinear.forward STE composition :582-605; ``fla/modules/convolution.py``
fft_conv :1012-1027 and PositionalEmbedding :1078-1100) executed in torch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mhla_tpu.layers import (  # noqa: E402
    BitLinear,
    ImplicitLongConvolution,
    LongConvolution,
    bit_linear,
)
from mhla_tpu.layers.bitlinear import activation_quant, weight_quant  # noqa: E402
from mhla_tpu.layers.long_conv import (  # noqa: E402
    fft_causal_conv,
    positional_features,
)
from mhla_tpu.utils.testing import assert_close  # noqa: E402


def _torch_activation_quant(x):
    scale = 127.0 / x.abs().max(dim=-1, keepdim=True).values.clamp_(min=1e-5)
    return (x * scale).round().clamp_(-128, 127) / scale


def _torch_weight_quant(w):
    scale = 1.0 / w.abs().mean().clamp_(min=1e-5)
    return (w * scale).round().clamp_(-1, 1) / scale


class TestBitLinear:
    def test_quantizers_match_reference(self):
        rng = np.random.RandomState(0)
        x = rng.randn(4, 64).astype(np.float32)
        w = rng.randn(64, 32).astype(np.float32) * 0.1
        assert_close(
            "activation_quant",
            _torch_activation_quant(torch.tensor(x)).numpy(),
            np.asarray(activation_quant(jnp.asarray(x))),
            1e-6,
        )
        assert_close(
            "weight_quant",
            _torch_weight_quant(torch.tensor(w)).numpy(),
            np.asarray(weight_quant(jnp.asarray(w))),
            1e-6,
        )

    def test_forward_matches_reference_composition(self):
        """norm -> STE act quant -> STE ternary matmul, identical weights
        (reference BitLinear.forward, fused_bitlinear.py:582-605; its
        self.norm is RMSNorm with a learned scale)."""
        rng = np.random.RandomState(1)
        x = rng.randn(3, 16, 64).astype(np.float32)
        w = (rng.randn(64, 32) * 0.05).astype(np.float32)
        g = (1 + 0.1 * rng.randn(64)).astype(np.float32)

        xt = torch.tensor(x)
        var = xt.pow(2).mean(-1, keepdim=True)
        xn = xt * torch.rsqrt(var + 1e-8) * torch.tensor(g)
        xq = xn + (_torch_activation_quant(xn) - xn).detach()
        wt = torch.tensor(w.T)  # torch linear keeps [out, in]
        wq = wt + (_torch_weight_quant(wt) - wt).detach()
        ref = torch.nn.functional.linear(xq, wq).numpy()

        out = bit_linear(jnp.asarray(x), jnp.asarray(w), norm_weight=jnp.asarray(g))
        assert_close("bit_linear fwd", ref, np.asarray(out), 1e-5)

    def test_ste_gradients_flow(self):
        model = BitLinear(features=8)
        x = jnp.asarray(np.random.RandomState(2).randn(2, 4, 16), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)

        def loss(p, x):
            return jnp.sum(model.apply(p, x) ** 2)

        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        leaves = jax.tree.leaves(gp) + [gx]
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # STE: quantization must not zero out the gradient
        assert float(jnp.abs(gx).max()) > 0
        assert float(jnp.abs(gp["params"]["kernel"]).max()) > 0


class TestLongConvolution:
    def test_fft_conv_matches_direct_causal(self):
        rng = np.random.RandomState(0)
        b, t, h, L = 2, 33, 5, 64
        u = rng.randn(b, t, h).astype(np.float32)
        filt = rng.randn(h, L).astype(np.float32)
        out = np.asarray(fft_causal_conv(jnp.asarray(u), jnp.asarray(filt)))
        # direct causal conv + residual (fft_conv computes y + u, gelu off)
        ref = u.copy()
        for dt_ in range(t):
            for l in range(min(dt_ + 1, L)):
                ref[:, dt_] += u[:, dt_ - l] * filt[:, l].T
        assert_close("fft causal conv", ref, out, 1e-4)

    def test_positional_features_match_reference(self):
        import math

        emb_dim, L = 5, 12
        t = torch.linspace(0, 1, L)[None, :, None]
        bands = (emb_dim - 1) // 2
        t_rescaled = torch.linspace(0, L - 1, L)[None, :, None]
        w = 2 * math.pi * t_rescaled / L
        f = torch.linspace(1e-4, bands - 1, bands)[None, None]
        z = torch.exp(-1j * f * w)
        ref = torch.cat([t, z.real, z.imag], dim=-1).numpy()
        assert_close(
            "positional features", ref,
            np.asarray(positional_features(emb_dim, L)), 1e-6,
        )

    @pytest.mark.parametrize("cls", [LongConvolution, ImplicitLongConvolution])
    def test_causality_and_grad(self, cls):
        b, t, h = 1, 24, 8
        model = cls(hidden_size=h, max_len=32)
        x = jnp.asarray(np.random.RandomState(3).randn(b, t, h), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        y0 = model.apply(params, x)
        # future perturbation must not affect past outputs
        x2 = x.at[:, t - 1].add(7.0)
        y2 = model.apply(params, x2)
        np.testing.assert_allclose(
            np.asarray(y0[:, : t - 1]), np.asarray(y2[:, : t - 1]),
            rtol=1e-5, atol=1e-5,
        )
        g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
