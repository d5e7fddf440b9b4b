import jax, jax.numpy as jnp
from mhla_tpu.kernels.sparse_attention import sparse_flash_attention
b, frames, hw, h, d = 1, 4, 64, 2, 128
t = frames*hw
q = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, d), jnp.bfloat16)
f = jax.jit(lambda qq: sparse_flash_attention(qq, qq, qq, num_frames=frames))
y1 = f(q); jax.block_until_ready(y1)
y2 = f(q * 2.0); jax.block_until_ready(y2)
g = jax.jit(lambda qq: sparse_flash_attention(qq * 1.5, qq, qq, num_frames=frames))
y3 = g(q); jax.block_until_ready(y3)
print("jit sparse OK", y3.shape)
