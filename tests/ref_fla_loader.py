"""Make the reference fla (NLP) package importable on CPU for golden tests.

The reference's fla modules hard-import Triton (GPU-only). For block/model
level goldens we want the reference's OWN orchestration code — the MHLA
layer (``fla/layers/mhla.py``), GLABlock/GLAForCausalLM
(``fla/models/gla/modeling_gla.py``) — executing for real, with only the
Triton kernel *dispatch points* replaced by the torch reference functions
that live in the same files (``rms_norm_ref``, ``rotary_embedding_ref``,
...) or their documented one-line equivalents.

Three layers of shimming:
1. a stub ``triton`` module (decorators return the function; no kernel is
   ever launched — every launch site is monkeypatched before it can run);
2. a package skeleton for ``fla`` with real ``__path__`` entries so module
   files load normally while the broken ``__init__.py`` files (SURVEY
   section 2.6: they import 28 model families that aren't shipped) are
   bypassed;
3. monkeypatches of the kernel dispatchers, applied immediately after each
   module loads (so later modules capture the patched names).
"""

from __future__ import annotations

import importlib.util
import sys
import types

import torch
import torch.nn.functional as F

BASE = "/root/reference/mhla_nlp"
_CACHE: dict = {}


def _mod_from_file(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _install_triton_stub():
    if "triton" in sys.modules:
        return

    # Pre-import every torch subsystem the fla modules pull in WHILE triton
    # is still absent: torch's triton probes (`try: import triton`) then
    # cache the no-triton state, instead of tripping over the stub later.
    import torch.distributed.tensor  # noqa: F401
    import torch.distributed.tensor.parallel  # noqa: F401
    import torch.utils.flop_counter  # noqa: F401

    try:
        import torch._inductor.output_code  # noqa: F401
    except Exception:
        pass
    import transformers  # noqa: F401  (its import_utils probes triton too)
    import transformers.cache_utils  # noqa: F401
    import transformers.generation  # noqa: F401
    import transformers.modeling_utils  # noqa: F401

    import importlib.machinery as _mach

    tr = types.ModuleType("triton")
    tr._fla_stub = True
    tr.__version__ = "3.2.0"
    # late find_spec('triton') calls read module.__spec__ — must not be None
    tr.__spec__ = _mach.ModuleSpec("triton", loader=None, is_package=True)

    class Config:
        def __init__(self, kwargs=None, **kw):
            self.kwargs = kwargs or {}
            for k, v in kw.items():
                setattr(self, k, v)

    def _jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda fn: fn

    tr.jit = _jit
    tr.autotune = lambda configs=None, key=None, **kw: (lambda fn: fn)
    tr.heuristics = lambda values=None: (lambda fn: fn)
    tr.Config = Config
    tr.cdiv = lambda a, b: -(-a // b)
    tr.next_power_of_2 = lambda n: 1 << max(int(n) - 1, 0).bit_length()
    # fla.utils probes triton.runtime.driver.active inside try/except
    tr.runtime = types.SimpleNamespace(driver=types.SimpleNamespace(active=None))
    tr.set_allocator = lambda fn: None

    tl = types.ModuleType("triton.language")

    class _Any:
        """Placeholder for tl.* names used in kernel annotations/bodies."""

        def __getattr__(self, name):
            if name.startswith("__"):  # keep inspect/copy machinery sane
                raise AttributeError(name)
            return _Any()

        def __call__(self, *a, **k):
            return _Any()

    def _tl_getattr(name):
        if name.startswith("__"):  # never answer dunder probes
            raise AttributeError(name)
        return _Any()

    tl.__getattr__ = _tl_getattr
    tl.constexpr = _Any()
    tl.math = _Any()
    extra = types.ModuleType("triton.language.extra")
    libdevice = types.ModuleType("triton.language.extra.libdevice")
    libdevice.__getattr__ = _tl_getattr
    extra.libdevice = libdevice
    tl.extra = extra
    tr.language = tl

    sys.modules["triton"] = tr
    sys.modules["triton.language"] = tl
    sys.modules["triton.language.extra"] = extra
    sys.modules["triton.language.extra.libdevice"] = libdevice

    # torch._inductor / _dynamo probe arbitrary triton submodules once
    # "triton" imports (e.g. triton.backends.compiler). Fabricate a
    # permissive stub for ANY triton.* import so those probes succeed.
    tr.__path__ = []

    import importlib.abc
    import importlib.machinery

    class _TritonStubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
        def find_spec(self, fullname, path=None, target=None):
            if fullname == "triton" or fullname.startswith("triton."):
                # `from X import Y` falls back to importing Y as a
                # submodule; refuse class-like (capitalized) leaf names so
                # that fallback raises ImportError as torch expects
                leaf = fullname.rsplit(".", 1)[-1]
                if leaf[:1].isupper():
                    return None
                return importlib.machinery.ModuleSpec(
                    fullname, self, is_package=True
                )
            return None

        def create_module(self, spec):
            # deliberately EMPTY (no permissive __getattr__): torch probes
            # e.g. `from triton.runtime.jit import JITFunction` and treats
            # the result as a type — a missing name must raise ImportError
            # (which torch catches) rather than yield a junk object
            mod = types.ModuleType(spec.name)
            mod.__path__ = []
            return mod

        def exec_module(self, module):
            pass

    sys.meta_path.append(_TritonStubFinder())


def _skeleton(name: str, path: str):
    mod = sys.modules.get(name) or types.ModuleType(name)
    mod.__path__ = [path]
    sys.modules[name] = mod
    return mod


def load_ref_fla():
    """Load and shim the reference fla package; returns the package module.

    After this, ``fla.layers.mhla`` (real code), ``fla.models.gla`` (real
    GLABlock/GLAModel/GLAForCausalLM) are importable and runnable on CPU.
    """
    if "pkg" in _CACHE:
        return _CACHE["pkg"]

    _install_triton_stub()

    fla = _skeleton("fla", f"{BASE}/fla")
    _skeleton("fla.layers", f"{BASE}/fla/layers")
    _skeleton("fla.models", f"{BASE}/fla/models")
    _skeleton("fla.models.gla", f"{BASE}/fla/models/gla")
    fla_modules = _skeleton("fla.modules", f"{BASE}/fla/modules")
    _skeleton("fla.ops", f"{BASE}/fla/ops")
    fla_ops_utils = _skeleton("fla.ops.utils", f"{BASE}/fla/ops/utils")
    _skeleton("fla.ops.mhla", f"{BASE}/fla/ops/mhla")

    # --- real support modules (triton-stub importable) ---
    _mod_from_file("fla.utils", f"{BASE}/fla/utils.py")
    op = _mod_from_file("fla.ops.utils.op", f"{BASE}/fla/ops/utils/op.py")
    index = _mod_from_file("fla.ops.utils.index", f"{BASE}/fla/ops/utils/index.py")
    for n in (
        "prepare_chunk_indices",
        "prepare_sequence_ids",
        "prepare_cu_seqlens_from_mask",
        "prepare_lens_from_mask",
    ):
        if hasattr(index, n):
            setattr(fla_ops_utils, n, getattr(index, n))
    fla_ops_utils.op = op
    fla_ops_utils.index = index
    lse = _mod_from_file(
        "fla.ops.utils.logsumexp", f"{BASE}/fla/ops/utils/logsumexp.py"
    )
    fla_ops_utils.logsumexp_fwd = lse.logsumexp_fwd  # triton; never called

    # --- activations: patch the fused entry points with plain torch ---
    acts = _mod_from_file(
        "fla.modules.activations", f"{BASE}/fla/modules/activations.py"
    )
    acts.swish = F.silu
    acts.sigmoid = torch.sigmoid
    acts.sqrelu = lambda x: torch.relu(x) ** 2
    acts.fast_gelu_impl = lambda x: F.gelu(x, approximate="tanh")
    acts.swiglu = lambda x, y: F.silu(x) * y
    acts.swiglu_linear = lambda x, y, w, b: F.linear(F.silu(x) * y, w, b)
    acts.ACT2FN = {
        "relu": F.relu,
        "sigmoid": torch.sigmoid,
        "logsigmoid": F.logsigmoid,
        "silu": F.silu,
        "swish": F.silu,
        "gelu": F.gelu,
        "tanh": torch.tanh,
        "identity": lambda x: x,
    }

    # --- layernorm: dispatch -> in-file torch reference functions.
    # The Triton kernels upcast to fp32 internally (upcast=True in every
    # *_ref comparison), and the prenorm residual-out is stored in the
    # input dtype unless residual_in_fp32. ---
    ln = _mod_from_file("fla.modules.layernorm", f"{BASE}/fla/modules/layernorm.py")

    def _norm_dispatch(ref_fn):
        def fn(x, weight, bias, residual=None, eps=1e-5, prenorm=False,
               residual_in_fp32=False):
            out = ref_fn(
                x, weight, bias, residual=residual, eps=eps, prenorm=prenorm,
                upcast=True,
            )
            if prenorm:
                out, res = out
                if not residual_in_fp32:
                    res = res.to(x.dtype)
                return out, res
            return out

        return fn

    ln.rms_norm = _norm_dispatch(ln.rms_norm_ref)
    ln.layer_norm = _norm_dispatch(ln.layer_norm_ref)

    # --- gated norm: y = norm(x) * act(g), fp32 compute (kernel semantics
    # at fused_norm_gate.py:34-121) ---
    fng = _mod_from_file(
        "fla.modules.fused_norm_gate", f"{BASE}/fla/modules/fused_norm_gate.py"
    )

    def _gated(is_rms):
        def fn(x, g, weight, bias, activation="swish", residual=None,
               prenorm=False, residual_in_fp32=False, eps=1e-6):
            dtype = x.dtype
            xf = x.float()
            if residual is not None:
                xf = xf + residual.float()
            res = xf
            if is_rms:
                rstd = torch.rsqrt(xf.square().mean(-1, keepdim=True) + eps)
                y = xf * rstd
            else:
                y = F.layer_norm(xf, xf.shape[-1:], eps=eps)
            if weight is not None:
                y = y * weight.float()
            if bias is not None:
                y = y + bias.float()
            gf = g.float()
            if activation in ("swish", "silu"):
                y = y * gf * torch.sigmoid(gf)
            elif activation == "sigmoid":
                y = y * torch.sigmoid(gf)
            y = y.to(dtype)
            if prenorm:
                return y, (res if residual_in_fp32 else res.to(dtype))
            return y

        return fn

    fng.rms_norm_gated = _gated(True)
    fng.layer_norm_gated = _gated(False)

    # --- rotary: dispatch -> in-file rotary_embedding_ref ---
    rot = _mod_from_file("fla.modules.rotary", f"{BASE}/fla/modules/rotary.py")

    def _rotary_embedding(x, cos, sin, interleaved=False, inplace=False,
                          seqlen_offsets=0, cu_seqlens=None):
        assert cu_seqlens is None, "goldens run the non-varlen path"
        t = x.shape[1]
        if torch.is_tensor(seqlen_offsets):
            assert (seqlen_offsets == seqlen_offsets.flatten()[0]).all()
            seqlen_offsets = int(seqlen_offsets.flatten()[0].item())
        return rot.rotary_embedding_ref(
            x.float(),
            cos[seqlen_offsets : seqlen_offsets + t].float(),
            sin[seqlen_offsets : seqlen_offsets + t].float(),
            interleaved,
        ).to(x.dtype)

    rot.rotary_embedding = _rotary_embedding

    # --- remaining real modules (capture the patched names above) ---
    conv = _mod_from_file(
        "fla.modules.convolution", f"{BASE}/fla/modules/convolution.py"
    )
    mlp = _mod_from_file("fla.modules.mlp", f"{BASE}/fla/modules/mlp.py")
    mlp.swiglu = acts.swiglu
    mlp.swiglu_linear = acts.swiglu_linear
    l2warp = _mod_from_file("fla.modules.l2warp", f"{BASE}/fla/modules/l2warp.py")
    fmap = _mod_from_file(
        "fla.modules.feature_map", f"{BASE}/fla/modules/feature_map.py"
    )
    fce = _mod_from_file(
        "fla.modules.fused_cross_entropy",
        f"{BASE}/fla/modules/fused_cross_entropy.py",
    )
    flce = _mod_from_file(
        "fla.modules.fused_linear_cross_entropy",
        f"{BASE}/fla/modules/fused_linear_cross_entropy.py",
    )

    # synthetic fla.modules package surface (the real __init__ imports
    # every module; we expose exactly what the model files import)
    fla_modules.RMSNorm = ln.RMSNorm
    fla_modules.LayerNorm = ln.LayerNorm
    fla_modules.GroupNorm = getattr(ln, "GroupNorm", None)
    fla_modules.FusedRMSNormGated = fng.FusedRMSNormGated
    fla_modules.FusedLayerNormGated = getattr(fng, "FusedLayerNormGated", None)
    fla_modules.ShortConvolution = conv.ShortConvolution
    fla_modules.GatedMLP = mlp.GatedMLP
    fla_modules.FusedCrossEntropyLoss = fce.FusedCrossEntropyLoss
    fla_modules.FusedLinearCrossEntropyLoss = flce.FusedLinearCrossEntropyLoss
    fla_modules.activations = acts
    fla_modules.layernorm = ln
    fla_modules.rotary = rot
    fla_modules.feature_map = fmap
    fla_modules.l2warp = l2warp

    # --- ops + layers ---
    naive = _mod_from_file("fla.ops.mhla.naive", f"{BASE}/fla/ops/mhla/naive.py")
    # bypass @torch.compile (inductor-on-CPU is irrelevant to the math)
    for n in ("naive_chunk_simple_mhla_fixed", "naive_recurrent_mhla"):
        fn = getattr(naive, n)
        setattr(naive, n, getattr(fn, "_torchdynamo_orig_callable", fn))

    _mod_from_file("fla.layers.utils", f"{BASE}/fla/layers/utils.py")
    mhla_layer = _mod_from_file("fla.layers.mhla", f"{BASE}/fla/layers/mhla.py")
    # modeling_gla.py:26 imports a name that does not exist in the reference
    # (SURVEY section 2.6 breakage #1); alias it so the real file imports
    mhla_layer.MHLA_with_rotary = mhla_layer.MHLA

    # dummy layer families never instantiated with attn_extends='mhla'
    for name, classes in [
        ("fla.layers.attn", ("Attention",)),
        ("fla.layers.gla", ("GatedLinearAttention",)),
        ("fla.layers.simple_gla", ("SimpleGatedLinearAttention",)),
    ]:
        m = types.ModuleType(name)
        for c in classes:
            setattr(m, c, type(c, (torch.nn.Module,), {}))
        sys.modules[name] = m

    _mod_from_file("fla.models.utils", f"{BASE}/fla/models/utils.py")
    _mod_from_file(
        "fla.models.modeling_layers", f"{BASE}/fla/models/modeling_layers.py"
    )
    _mod_from_file(
        "fla.models.gla.configuration_gla",
        f"{BASE}/fla/models/gla/configuration_gla.py",
    )
    modeling = _mod_from_file(
        "fla.models.gla.modeling_gla", f"{BASE}/fla/models/gla/modeling_gla.py"
    )

    fla.modules = fla_modules
    fla.modeling_gla = modeling
    _CACHE["pkg"] = fla
    return fla
