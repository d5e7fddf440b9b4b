"""Wan2.2 VAE: shapes, causality, patchify/shortcut semantics, and golden
parity vs the reference streaming torch implementation."""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.models.vae22 import (
    VAE22Config,
    Wan22VAE,
    avg_down3d,
    convert_vae22_checkpoint,
    dup_up3d,
    patchify2,
    unpatchify2,
)
from mhla_tpu.utils.testing import assert_close

REF_VAE22 = "/root/reference/mhla_videogen/diffusion/model/wan2_2/vae.py"

TINY = VAE22Config(
    dim=8, dec_dim=8, z_dim=4, dim_mult=(2, 2), num_res_blocks=1,
    temporal_downsample=(True,),
)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def _load_ref():
    torch = pytest.importorskip("torch")  # noqa: F841
    pytest.importorskip("einops")
    if not os.path.exists(REF_VAE22):
        pytest.skip("reference checkout not available")
    if "omegaconf" not in sys.modules:
        # the module imports OmegaConf at top level but WanVAE_ never uses
        # it — stub it out so the import succeeds without the dependency
        stub = types.ModuleType("omegaconf")
        stub.OmegaConf = types.SimpleNamespace(
            to_object=lambda x: x, structured=lambda x: x
        )
        sys.modules["omegaconf"] = stub
    spec = importlib.util.spec_from_file_location("ref_vae22", REF_VAE22)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestPatchifyAndShortcuts:
    def test_patchify_roundtrip_and_torch_semantics(self, key):
        x = jax.random.normal(key, (2, 3, 8, 6, 3))
        p = patchify2(x)
        assert p.shape == (2, 3, 4, 3, 12)
        assert_close("unpatchify roundtrip", x, unpatchify2(p), 1e-7)
        # channel order matches the reference einops rearrange
        einops = pytest.importorskip("einops")
        xt = np.asarray(x).transpose(0, 4, 1, 2, 3)  # NCTHW
        ref = einops.rearrange(
            xt, "b c f (h q) (w r) -> b (c r q) f h w", q=2, r=2
        )
        assert_close(
            "patchify vs einops", ref.transpose(0, 2, 3, 4, 1), p, 1e-7
        )

    def test_avg_down_vs_torch(self, key):
        torch = pytest.importorskip("torch")
        ref_mod = _load_ref()
        x = jax.random.normal(key, (1, 5, 8, 8, 6))
        got = avg_down3d(x, out_ch=12, factor_t=2, factor_s=2)
        m = ref_mod.AvgDown3D(6, 12, factor_t=2, factor_s=2)
        xt = torch.tensor(np.asarray(x).transpose(0, 4, 1, 2, 3))
        ref = m(xt).numpy().transpose(0, 2, 3, 4, 1)
        assert_close("avg_down3d", ref, got, 1e-6)

    def test_dup_up_vs_torch(self, key):
        torch = pytest.importorskip("torch")
        ref_mod = _load_ref()
        x = jax.random.normal(key, (1, 3, 4, 4, 12))
        got = dup_up3d(x, out_ch=6, factor_t=2, factor_s=2, first_chunk=True)
        m = ref_mod.DupUp3D(12, 6, factor_t=2, factor_s=2)
        xt = torch.tensor(np.asarray(x).transpose(0, 4, 1, 2, 3))
        ref = m(xt, first_chunk=True).numpy().transpose(0, 2, 3, 4, 1)
        assert_close("dup_up3d", ref, got, 1e-6)


class TestWan22VAE:
    @pytest.mark.slow
    def test_encode_decode_shapes(self, key):
        vae = Wan22VAE(TINY)
        video = jax.random.normal(key, (1, 5, 16, 16, 3))
        params = vae.init(key, video)
        z = vae.apply(params, video, method=Wan22VAE.encode)
        # patchify /2, one downsampling stage /2 -> /4 spatial; one 3d
        # temporal stage: 5 -> 3
        assert z.shape == (1, 3, 4, 4, TINY.z_dim)
        x = vae.apply(params, z, method=Wan22VAE.decode)
        assert x.shape == (1, 5, 16, 16, 3)
        assert float(jnp.abs(x).max()) <= 1.0

    def test_full_scale_ratios(self):
        """Wan2.2 config: 81 frames -> 21 latent frames, /16 spatial, 48ch."""
        cfg = VAE22Config()
        z_shape = jax.eval_shape(
            lambda v: Wan22VAE(cfg).init_with_output(
                jax.random.PRNGKey(0), v, method=Wan22VAE.encode
            )[0],
            jax.ShapeDtypeStruct((1, 81, 64, 64, 3), jnp.float32),
        )
        assert z_shape.shape == (1, 21, 4, 4, 48)

    @pytest.mark.slow
    def test_temporal_causality(self, key):
        vae = Wan22VAE(TINY)
        video = jax.random.normal(key, (1, 9, 16, 16, 3))
        params = vae.init(key, video)
        z1 = vae.apply(params, video, method=Wan22VAE.encode)
        video2 = video.at[:, -4:].set(0.0)
        z2 = vae.apply(params, video2, method=Wan22VAE.encode)
        assert_close("vae22 causality", z1[:, :2], z2[:, :2], 1e-5)


class TestGoldenVsReference:
    @pytest.mark.slow
    def test_encode_matches_streaming_torch(self, key):
        """Full golden: random reference weights -> converter -> our
        single-shot encode equals the reference's chunked streaming encode."""
        torch = pytest.importorskip("torch")
        ref_mod = _load_ref()
        torch.manual_seed(0)
        ref = ref_mod.WanVAE_(
            dim=TINY.dim, dec_dim=TINY.dec_dim, z_dim=TINY.z_dim,
            dim_mult=list(TINY.dim_mult), num_res_blocks=TINY.num_res_blocks,
            attn_scales=[], temperal_downsample=list(TINY.temporal_downsample),
        ).eval()
        state = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = convert_vae22_checkpoint(state, TINY)

        video = jax.random.normal(key, (1, 5, 16, 16, 3), jnp.float32)
        vt = torch.tensor(np.asarray(video).transpose(0, 4, 1, 2, 3))
        with torch.no_grad():
            mu_ref = ref.encode(vt, scale=[0.0, 1.0]).numpy()
        vae = Wan22VAE(TINY)
        # raw mu (un-normalized): encode() normalizes, so invert the stats
        from mhla_tpu.models.vae22 import WAN22_LATENT_MEAN, WAN22_LATENT_STD

        z = vae.apply(params, video, method=Wan22VAE.encode)
        mu = np.asarray(z) * np.asarray(
            WAN22_LATENT_STD[: TINY.z_dim]
        ) + np.asarray(WAN22_LATENT_MEAN[: TINY.z_dim])
        assert_close(
            "wan2.2 encode golden", mu_ref.transpose(0, 2, 3, 4, 1), mu, 1e-4
        )

    @pytest.mark.slow
    def test_decode_matches_streaming_torch(self, key):
        torch = pytest.importorskip("torch")
        ref_mod = _load_ref()
        torch.manual_seed(1)
        ref = ref_mod.WanVAE_(
            dim=TINY.dim, dec_dim=TINY.dec_dim, z_dim=TINY.z_dim,
            dim_mult=list(TINY.dim_mult), num_res_blocks=TINY.num_res_blocks,
            attn_scales=[], temperal_downsample=list(TINY.temporal_downsample),
        ).eval()
        state = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = convert_vae22_checkpoint(state, TINY)

        z = jax.random.normal(key, (1, 3, 4, 4, TINY.z_dim), jnp.float32)
        zt = torch.tensor(np.asarray(z).transpose(0, 4, 1, 2, 3))
        with torch.no_grad():
            x_ref = ref.decode(zt, scale=[0.0, 1.0]).numpy()
        from mhla_tpu.models.vae22 import WAN22_LATENT_MEAN, WAN22_LATENT_STD

        zn = (
            np.asarray(z) - np.asarray(WAN22_LATENT_MEAN[: TINY.z_dim])
        ) / np.asarray(WAN22_LATENT_STD[: TINY.z_dim])
        vae = Wan22VAE(TINY)
        x = vae.apply(params, jnp.asarray(zn), method=Wan22VAE.decode)
        assert_close(
            "wan2.2 decode golden",
            np.clip(x_ref.transpose(0, 2, 3, 4, 1), -1, 1),
            x,
            1e-4,
        )
