"""mhla_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for token-level
Multi-Head Linear Attention (MHLA, ICLR 2026, arXiv:2601.07832).

Re-designed from scratch for TPU hardware with the capabilities of the
reference PyTorch/Triton implementation (DAGroup-PKU/MHLA):

- ``mhla_tpu.ops``      — functional MHLA operators (jnp oracles + dispatch)
- ``mhla_tpu.kernels``  — Pallas TPU kernels for the hot ops
- ``mhla_tpu.layers``   — flax.linen layers (MHLA causal/2D/3D, baselines)
- ``mhla_tpu.models``   — model families: causal LM, ViT, DiT, Wan video
- ``mhla_tpu.diffusion``— gaussian diffusion / flow matching / samplers
- ``mhla_tpu.parallel`` — mesh + sharding rules (dp/fsdp/tp/sp over ICI)
- ``mhla_tpu.train``    — pjit trainers, EMA, grad-accum, checkpointing
- ``mhla_tpu.data``     — LM token packing, synthetic + latent datasets
- ``mhla_tpu.eval``     — perplexity, FID plumbing
"""

__version__ = "0.1.0"
