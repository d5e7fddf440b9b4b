"""Block-axis context parallelism tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mhla_tpu.ops import init_causal_mixing_matrix, mhla_chunk
from mhla_tpu.ops.mhla_blockwise import mhla_blockwise_mh
from mhla_tpu.parallel import make_mesh
from mhla_tpu.parallel.context_parallel import mhla_blockwise_cp, mhla_chunk_cp
from mhla_tpu.utils.testing import assert_close

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


class TestCausalCP:
    def test_matches_single_device(self, key):
        mesh = make_mesh()  # fsdp axis = 8
        b, t, h, dk, dv = 2, 8 * 2 * 16, 2, 8, 8  # 16 chunks of 16, 2/device
        ks = jax.random.split(key, 3)
        q = jax.nn.relu(jax.random.normal(ks[0], (b, t, h, dk)))
        k = jax.nn.relu(jax.random.normal(ks[1], (b, t, h, dk)))
        v = jax.random.normal(ks[2], (b, t, h, dv))
        m = init_causal_mixing_matrix(16)

        o_ref, _ = mhla_chunk(q, k, v, m, chunk_size=16)

        sharding = NamedSharding(mesh, P(None, "fsdp", None, None))
        q_s, k_s, v_s = (jax.device_put(x, sharding) for x in (q, k, v))
        with mesh:
            o_cp = mhla_chunk_cp(q_s, k_s, v_s, m, mesh, chunk_size=16)
        assert_close("causal cp", o_ref, np.asarray(o_cp), 1e-5)
        # output keeps the sequence sharding
        assert o_cp.sharding.spec == P(None, "fsdp", None, None)

    @pytest.mark.slow
    def test_grad_flows(self, key):
        mesh = make_mesh()
        b, t, h, d = 1, 8 * 16, 2, 8
        q = jax.nn.relu(jax.random.normal(key, (b, t, h, d)))
        m = init_causal_mixing_matrix(8)

        def loss(q):
            with mesh:
                o = mhla_chunk_cp(q, q, q, m, mesh, chunk_size=16)
            return jnp.sum(o**2)

        g = jax.grad(loss)(q)
        assert np.isfinite(np.asarray(g)).all()


class TestBlockwiseCP:
    def test_matches_single_device(self, key):
        mesh = make_mesh()
        b, n, c, h, d = 1, 16, 8, 2, 8
        ks = jax.random.split(key, 5)
        q = jax.nn.relu(jax.random.normal(ks[0], (b, n, c, h, d))) + 1e-6
        k = jax.nn.relu(jax.random.normal(ks[1], (b, n, c, h, d))) + 1e-6
        v = jax.random.normal(ks[2], (b, n, c, h, d))
        qn = jax.nn.relu(jax.random.normal(ks[3], (b, n, c, h, d))) + 1e-6
        kn = jax.nn.relu(jax.random.normal(ks[4], (b, n, c, h, d))) + 1e-6
        m = jax.random.uniform(key, (n, n)) + 0.05

        o_ref = mhla_blockwise_mh(q, k, v, m, q_nope=qn, k_nope=kn)

        sharding = NamedSharding(mesh, P(None, "fsdp", None, None, None))
        args = [jax.device_put(x, sharding) for x in (q, k, v, qn, kn)]
        with mesh:
            o_cp = mhla_blockwise_cp(
                args[0], args[1], args[2], m, mesh, q_nope=args[3], k_nope=args[4]
            )
        assert_close("blockwise cp", o_ref, np.asarray(o_cp), 1e-5)

    def test_no_normalize_defaults(self, key):
        mesh = make_mesh()
        b, n, c, h, d = 1, 8, 4, 2, 8
        q = jax.nn.relu(jax.random.normal(key, (b, n, c, h, d))) + 1e-6
        v = jax.random.normal(key, (b, n, c, h, d))
        m = jnp.eye(n)
        o_ref = mhla_blockwise_mh(q, q, v, m, normalize=False)
        sharding = NamedSharding(mesh, P(None, "fsdp", None, None, None))
        qs = jax.device_put(q, sharding)
        vs = jax.device_put(v, sharding)
        with mesh:
            o_cp = mhla_blockwise_cp(qs, qs, vs, m, mesh, normalize=False)
        assert_close("blockwise cp eye", o_ref, np.asarray(o_cp), 1e-5)
