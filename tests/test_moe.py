"""MoE FFN + expert parallelism (parallel/moe.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssp_x_vit_tpu.parallel.moe import (
    MoEConfig, init_moe_params, moe_ffn, shard_moe_params,
)

CFG = MoEConfig(hidden_size=32, expert_intermediate=64, num_experts=4,
                capacity_factor=2.0)


def _data(key=0, b=2, s=16):
    return jax.random.normal(jax.random.PRNGKey(key), (b, s, CFG.hidden_size),
                             jnp.float32)


def test_moe_matches_dense_when_experts_identical():
    """With identical experts and ample capacity, switch-MoE == a single
    SwiGLU FFN scaled by the top-1 router prob."""
    params = init_moe_params(jax.random.PRNGKey(0), CFG)
    for k in ("gate_kernel", "up_kernel", "down_kernel"):
        params[k] = jnp.broadcast_to(params[k][:1], params[k].shape)
    x = _data()
    y, aux = moe_ffn(params, x, CFG)
    assert float(aux["dropped"]) == 0.0

    logits = x.reshape(-1, 32) @ params["router"]
    gate = jnp.max(jax.nn.softmax(logits, -1), axis=-1).reshape(x.shape[:2])
    g = x @ params["gate_kernel"][0]
    u = x @ params["up_kernel"][0]
    dense = (jax.nn.silu(g) * u) @ params["down_kernel"][0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense * gate[..., None]),
                               atol=1e-5, rtol=1e-4)


def test_moe_capacity_drops_overflow():
    """Tokens past an expert's capacity contribute zero (switch fallthrough)."""
    tiny = MoEConfig(hidden_size=32, expert_intermediate=64, num_experts=4,
                     capacity_factor=0.05)  # C = 1 token per expert
    params = init_moe_params(jax.random.PRNGKey(0), tiny)
    y, aux = moe_ffn(params, _data(), tiny)
    assert float(aux["dropped"]) > 0.5
    assert np.isfinite(np.asarray(y)).all()


def test_moe_expert_parallel_matches_single():
    """ep=4 sharded forward == single-device forward (XLA all_to_all under
    GSPMD sharding constraints changes nothing numerically)."""
    params = init_moe_params(jax.random.PRNGKey(1), CFG)
    x = _data(1)
    y_single, aux_single = jax.jit(lambda p, x: moe_ffn(p, x, CFG))(params, x)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "expert"))
    sharded = shard_moe_params(params, mesh)
    assert sharded["gate_kernel"].sharding.spec == P("expert", None, None)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    y_ep, aux_ep = jax.jit(lambda p, x: moe_ffn(p, x, CFG, mesh=mesh))(sharded, xs)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_single),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(aux_ep["load"]),
                               np.asarray(aux_single["load"]), atol=1e-6)


def test_moe_differentiable():
    params = init_moe_params(jax.random.PRNGKey(2), CFG)
    x = _data(2)

    def loss(p):
        y, aux = moe_ffn(p, x, CFG)
        return jnp.mean(jnp.square(y)) + 0.01 * aux["aux_loss"]

    grads = jax.grad(loss)(params)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
    assert float(jnp.abs(grads["router"]).sum()) > 0.0


def test_capacity_top2_matches_dropless_when_roomy():
    """GShard top-2 with capacity >= all assignments must equal the dropless
    top-2 path exactly (same routing, same renormalized gates, no drops)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssp_x_vit_tpu.parallel.moe import (
        MoEConfig, init_moe_params, moe_ffn, moe_ffn_dropless,
    )

    d, f, E = 16, 32, 4
    cfg = MoEConfig(d, f, E, capacity_factor=float(E), top_k=2)  # C >= T
    params = init_moe_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, d), jnp.float32)
    y_cap, aux_cap = moe_ffn(params, x, cfg)
    y_free, _ = moe_ffn_dropless(params, x, cfg)
    np.testing.assert_allclose(np.asarray(y_cap), np.asarray(y_free),
                               rtol=1e-5, atol=1e-6)
    assert float(aux_cap["dropped"]) == 0.0
