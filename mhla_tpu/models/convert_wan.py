"""Wan2.1 checkpoint conversion: torch state dict -> flax WanModel params.

The reference initializes its hybrid model from the pretrained Wan2.1
diffusion checkpoint (``load_model_ckpt``, ``wan/model.py:2254``): softmax
layers load fully, and MHLA layers inherit the q/k/v/o projections and
q/k norms from the original attention (same parameter names); the
MHLA-specific parts (gate projection, per-head output norm) start fresh.
This converter reproduces that behavior for :class:`mhla_tpu.models.wan.WanModel`.

Torch naming (diffusers-style, see reference ``WanModel.__init__``):
``patch_embedding``, ``text_embedding.{0,2}``, ``time_embedding.{0,2}``,
``time_projection.1``, ``blocks.{i}.{self_attn,cross_attn}.{q,k,v,o}``,
``blocks.{i}.norm_q/norm_k`` (inside attn), ``blocks.{i}.norm3``,
``blocks.{i}.ffn.{0,2}``, ``blocks.{i}.modulation``, ``head.head``,
``head.modulation``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .wan import WanConfig


def rope_feature_permutation(dim: int, num_heads: int) -> np.ndarray:
    """Per-head evens-then-odds feature permutation.

    This framework applies 3D RoPE in rotate-half form (TPU lane-friendly;
    ``ops/rotary.py::apply_rotary_3d_halves``) while the reference uses the
    interleaved complex-pair form. The two are exactly equivalent when the
    q/k features are reordered so interleaved pair (2i, 2i+1) lands on
    halves pair (i, i + d/2) — i.e. permute each head's features to evens
    then odds. Applied to q/k projection outputs (and their norms) when
    converting reference checkpoints.
    """
    d = dim // num_heads
    per_head = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    return np.concatenate([h * d + per_head for h in range(num_heads)])


def _lin(state, key):
    out = {"kernel": np.asarray(state[key + ".weight"]).T}
    if key + ".bias" in state:
        out["bias"] = np.asarray(state[key + ".bias"])
    return out


def _lin_perm(state, key, perm):
    """Linear whose OUTPUT features are permuted (rope pair reorder)."""
    out = {"kernel": np.asarray(state[key + ".weight"]).T[:, perm]}
    if key + ".bias" in state:
        out["bias"] = np.asarray(state[key + ".bias"])[perm]
    return out


def _norm_w(state, key):
    return {"weight": np.asarray(state[key + ".weight"])}


def _layernorm(state, key):
    out = {}
    if key + ".weight" in state:
        out["weight"] = np.asarray(state[key + ".weight"])
    if key + ".bias" in state:
        out["bias"] = np.asarray(state[key + ".bias"])
    return out


def convert_wan_checkpoint(
    state: Dict[str, np.ndarray],
    cfg: WanConfig,
    init_params: Optional[Dict] = None,
) -> Dict:
    """Convert a Wan2.1 torch state dict. ``init_params`` (a freshly
    initialized param tree) supplies values for parameters absent from the
    checkpoint (the MHLA gate/g_norm of hybrid layers); without it, missing
    parameters raise."""
    fresh = (init_params or {}).get("params", {})

    params: Dict[str, Any] = {
        # Conv3d [out, in, kt, kh, kw] -> [kt, kh, kw, in, out]
        "patch_embedding": {
            "kernel": np.asarray(state["patch_embedding.weight"]).transpose(
                2, 3, 4, 1, 0
            ),
            "bias": np.asarray(state["patch_embedding.bias"]),
        },
        "text_fc1": _lin(state, "text_embedding.0"),
        "text_fc2": _lin(state, "text_embedding.2"),
        "time_fc1": _lin(state, "time_embedding.0"),
        "time_fc2": _lin(state, "time_embedding.2"),
        "time_projection": _lin(state, "time_projection.1"),
        "head": _lin(state, "head.head"),
        "head_modulation": np.asarray(state["head.modulation"]),
    }

    perm = rope_feature_permutation(cfg.dim, cfg.num_heads)
    for i in range(cfg.num_layers):
        p = f"blocks.{i}."
        attn_type = cfg.layer_attn_type(i)
        # q/k features reordered for the rotate-half 3D RoPE (see
        # rope_feature_permutation). For MHLA layers the reference applies
        # its q/k RMSNorm over the full dim BEFORE the head split, and the
        # norm weight must follow the same permutation.
        self_attn: Dict[str, Any] = {
            "q": _lin_perm(state, p + "self_attn.q", perm),
            "k": _lin_perm(state, p + "self_attn.k", perm),
            "v": _lin(state, p + "self_attn.v"),
            "o": _lin(state, p + "self_attn.o"),
        }
        if cfg.qk_norm:
            self_attn["norm_q"] = {
                "weight": np.asarray(state[p + "self_attn.norm_q.weight"])[perm]
            }
            self_attn["norm_k"] = {
                "weight": np.asarray(state[p + "self_attn.norm_k.weight"])[perm]
            }
        if attn_type == "mhla_uni":
            # MHLA-specific params (gate proj + per-head norm): taken from
            # the checkpoint when present (a checkpoint saved FROM the
            # hybrid model, e.g. the full-model golden test), fresh
            # otherwise (the reference's load_model_ckpt path: pretrained
            # Wan2.1 checkpoints predate the MHLA layers)
            fresh_attn = fresh.get(f"blocks_{i}", {}).get("self_attn", {})
            if p + "self_attn.g.weight" in state:
                self_attn["g"] = _lin(state, p + "self_attn.g")
            if p + "self_attn.g_norm.weight" in state:
                self_attn["g_norm"] = _norm_w(state, p + "self_attn.g_norm")
            for name in ("g", "g_norm"):
                if name in self_attn:
                    continue
                if name in fresh_attn:
                    self_attn[name] = fresh_attn[name]
                elif name == "g" and cfg.is_gated:
                    raise KeyError(
                        f"blocks_{i}.self_attn.{name} missing: pass init_params"
                    )
                elif name == "g_norm":
                    dim_head = cfg.dim // cfg.num_heads
                    self_attn[name] = {"weight": np.ones(dim_head, np.float32)}
        elif attn_type in ("mllalinear", "mllalepe"):
            # MLLA STConv weights: torch depthwise Conv2d [C, 1, 3, 3] ->
            # flax [3, 3, 1, C]; Conv1d [C, 1, 3] -> [3, 1, C]
            def _stconv(prefix):
                return {
                    "spatial_conv": {
                        "kernel": np.asarray(
                            state[prefix + ".spatial_conv.weight"]
                        ).transpose(2, 3, 1, 0),
                        "bias": np.asarray(state[prefix + ".spatial_conv.bias"]),
                    },
                    "temporal_conv": {
                        "kernel": np.asarray(
                            state[prefix + ".temporal_conv.weight"]
                        ).transpose(2, 1, 0),
                        "bias": np.asarray(state[prefix + ".temporal_conv.bias"]),
                    },
                }

            self_attn["st_conv"] = _stconv(p + "self_attn.st_conv")
            if attn_type == "mllalepe":
                self_attn["lepe_conv"] = _stconv(p + "self_attn.lepe_conv")

        blk: Dict[str, Any] = {
            "self_attn": self_attn,
            "modulation": np.asarray(state[p + "modulation"]),
            "cross_attn": {
                "q": _lin(state, p + "cross_attn.q"),
                "k": _lin(state, p + "cross_attn.k"),
                "v": _lin(state, p + "cross_attn.v"),
                "o": _lin(state, p + "cross_attn.o"),
            },
            "ffn_fc1": _lin(state, p + "ffn.0"),
            "ffn_fc2": _lin(state, p + "ffn.2"),
        }
        if cfg.qk_norm:
            blk["cross_attn"]["norm_q"] = _norm_w(state, p + "cross_attn.norm_q")
            blk["cross_attn"]["norm_k"] = _norm_w(state, p + "cross_attn.norm_k")
        if cfg.model_type == "i2v":
            blk["cross_attn"]["k_img"] = _lin(state, p + "cross_attn.k_img")
            blk["cross_attn"]["v_img"] = _lin(state, p + "cross_attn.v_img")
            blk["cross_attn"]["norm_k_img"] = _norm_w(
                state, p + "cross_attn.norm_k_img"
            )
        if cfg.cross_attn_norm:
            blk["norm3"] = _layernorm(state, p + "norm3")
        params[f"blocks_{i}"] = blk

    if cfg.model_type == "i2v":
        params["img_norm_in"] = _layernorm(state, "img_emb.proj.0")
        params["img_fc1"] = _lin(state, "img_emb.proj.1")
        params["img_fc2"] = _lin(state, "img_emb.proj.3")
        params["img_norm_out"] = _layernorm(state, "img_emb.proj.4")

    return {"params": params}


def load_wan_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors checkpoint into numpy arrays."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out
