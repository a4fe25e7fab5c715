"""Mixture-of-Experts FFN with expert parallelism (GShard dispatch on TPU).

The reference framework has no MoE; this completes the rebuild's parallelism
suite (dp/tp/pp/sp + ep) for scale-out deployments. Design is the GShard /
Switch einsum formulation, which is the TPU-native one:

- top-1 (switch) routing with a per-expert capacity ``C``; overflow tokens
  fall through on the residual path (standard switch behavior);
- dispatch/combine are DENSE einsums against a [tokens, E, C] one-hot —
  static shapes, MXU-friendly, no sorting or dynamic gathers;
- per-expert SwiGLU FFNs run as ONE batched einsum over the expert axis;
- expert parallelism = sharding the expert axis of the weights and the
  [E, C, d] dispatched activations over an ``expert`` mesh axis with
  ``with_sharding_constraint`` — XLA inserts the all_to_all pair (GSPMD),
  exactly how production TPU MoE stacks shard.

Numerics are independent of the mesh: the ep-sharded forward equals the
single-device forward bit-for-bit in tests/test_moe.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    hidden_size: int
    expert_intermediate: int
    num_experts: int
    capacity_factor: float = 1.25
    top_k: int = 1  # 1 = switch; 2 = mixtral-style (capacity AND dropless)

    def capacity(self, num_tokens: int) -> int:
        c = int(self.capacity_factor * num_tokens / self.num_experts)
        return max(1, -(-c // 8) * 8)  # multiple of 8 for sublane tiling


def init_moe_params(rng: jax.Array, cfg: MoEConfig, dtype=jnp.float32) -> Params:
    d, f, E = cfg.hidden_size, cfg.expert_intermediate, cfg.num_experts
    ks = jax.random.split(rng, 4)

    def nrm(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    return {
        "router": nrm(ks[0], (d, E)),
        "gate_kernel": nrm(ks[1], (E, d, f)),
        "up_kernel": nrm(ks[2], (E, d, f)),
        "down_kernel": nrm(ks[3], (E, f, d)),
    }


def moe_param_specs() -> Dict[str, P]:
    return {
        "router": P(None, None),
        "gate_kernel": P("expert", None, None),
        "up_kernel": P("expert", None, None),
        "down_kernel": P("expert", None, None),
    }


def shard_moe_params(params: Params, mesh: Mesh) -> Params:
    return jax.tree.map(
        lambda spec, leaf: jax.device_put(leaf, NamedSharding(mesh, spec)),
        moe_param_specs(), params, is_leaf=lambda x: isinstance(x, P))


def moe_ffn(params: Params, x: jax.Array, cfg: MoEConfig,
            mesh: Optional[Mesh] = None):
    """x [b, s, d] -> (y [b, s, d], aux) via capacity-routed expert FFNs
    (top-1 switch by default; ``cfg.top_k=2`` gives GShard/mixtral top-2
    with renormalized gates and choice-major queue slotting).

    ``mesh`` (with an 'expert' axis) adds sharding constraints on the expert
    axis of the dispatched activations; pass None for single-device.
    aux: {'load': per-expert fraction of routed top-k assignments [E],
    'dropped': fraction of tokens with no surviving assignment,
    'aux_loss': switch load-balance loss}.
    """
    b, s, d = x.shape
    E = cfg.num_experts
    T = b * s
    # top-2 needs room for both assignment rounds in the expert queues
    C = cfg.capacity(T) * max(1, cfg.top_k)
    xt = x.reshape(T, d)

    logits = (xt.astype(jnp.float32) @ params["router"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                    # [T, E]
    top_p, top_e = jax.lax.top_k(probs, cfg.top_k)             # [T, k]
    if cfg.top_k > 1:
        top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)

    # GShard-style capacity slotting, choice-major: all primary assignments
    # claim queue slots first, then each later choice appends after the
    # counts of the earlier rounds (flaxformer convention).
    dispatch = jnp.zeros((T, E, C), x.dtype)
    combine = jnp.zeros((T, E, C), x.dtype)
    counts = jnp.zeros((E,), jnp.int32)
    keep_any = jnp.zeros((T,), bool)
    for kk in range(cfg.top_k):
        e_k = top_e[:, kk]
        onehot_k = jax.nn.one_hot(e_k, E, dtype=jnp.int32)     # [T, E]
        pos_k = jnp.sum((jnp.cumsum(onehot_k, axis=0) - onehot_k) * onehot_k,
                        axis=-1) + counts[e_k]                 # [T]
        counts = counts + jnp.sum(onehot_k, axis=0)
        keep_k = pos_k < C
        keep_any = jnp.logical_or(keep_any, keep_k)
        gate_k = jnp.where(keep_k, top_p[:, kk], 0.0)
        d_k = (jax.nn.one_hot(e_k, E, dtype=x.dtype)[:, :, None]
               * jax.nn.one_hot(jnp.where(keep_k, pos_k, C), C + 1,
                                dtype=x.dtype)[:, None, :C])   # [T, E, C]
        dispatch = dispatch + d_k
        combine = combine + d_k * gate_k.astype(x.dtype)[:, None, None]
    # membership count over ALL routed choices (same convention as the
    # dropless path — a primary-only count would leave second-slot routing
    # unregularized by the balance loss)
    onehot = jnp.sum(jax.nn.one_hot(top_e, E, dtype=jnp.int32), axis=1)
    keep = keep_any

    ex_in = jnp.einsum("tec,td->ecd", dispatch, xt)            # [E, C, d]
    if mesh is not None:
        ex_in = jax.lax.with_sharding_constraint(
            ex_in, NamedSharding(mesh, P("expert", None, None)))
    g = jnp.einsum("ecd,edf->ecf", ex_in, params["gate_kernel"].astype(x.dtype))
    u = jnp.einsum("ecd,edf->ecf", ex_in, params["up_kernel"].astype(x.dtype))
    ex_out = jnp.einsum("ecf,efd->ecd", jax.nn.silu(g) * u,
                        params["down_kernel"].astype(x.dtype))
    if mesh is not None:
        ex_out = jax.lax.with_sharding_constraint(
            ex_out, NamedSharding(mesh, P("expert", None, None)))
    y = jnp.einsum("tec,ecd->td", combine, ex_out).reshape(b, s, d)

    load = jnp.mean(onehot.astype(jnp.float32), axis=0)        # [E]
    importance = jnp.mean(probs, axis=0)
    aux = {
        "load": load,
        "dropped": 1.0 - jnp.mean(keep.astype(jnp.float32)),
        "aux_loss": E * jnp.sum(load * importance),            # switch LB loss
    }
    return y, aux


def moe_ffn_dropless(params: Params, x: jax.Array, cfg: MoEConfig):
    """Dropless top-1 MoE: every token is computed by EVERY expert (E x the
    dense FLOPs) and the router gate selects/weights the outputs — exact and
    sequence-length-INDEPENDENT, unlike the capacity formulation where a
    token's fate depends on how many earlier tokens picked its expert.
    This is the inference-correct semantics (KV-cached decode must equal the
    full-recompute forward regardless of how many tokens are processed per
    dispatch); the capacity/dispatch form above is the training-efficiency
    construct. The expert axis of the [T, E, f] intermediates shards over
    'expert' exactly like the dispatched form (GSPMD inserts the final
    psum over E)."""
    b, s, d = x.shape
    E = cfg.num_experts
    xt = x.reshape(b * s, d)

    logits = xt.astype(jnp.float32) @ params["router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                    # [T, E]
    if cfg.top_k == 1:
        expert = jnp.argmax(probs, axis=-1)                    # [T]
        gate = jnp.take_along_axis(probs, expert[:, None], axis=1)[:, 0]
        sel = (jax.nn.one_hot(expert, E, dtype=x.dtype)
               * gate.astype(x.dtype)[:, None])                # [T, E]
    else:
        # mixtral-style top-k: gates renormalized over the selected experts
        top_p, top_e = jax.lax.top_k(probs, cfg.top_k)         # [T, k]
        top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
        sel = jnp.sum(jax.nn.one_hot(top_e, E, dtype=jnp.float32)
                      * top_p[..., None], axis=1).astype(x.dtype)  # [T, E]

    def expert_mm(spec, t, name, scale_shape):
        """einsum against a bf16/f32, int8, or packed-int4 expert kernel —
        per-(expert, out-channel) scales fold into the epilogue, so the
        quantized codes stream straight into the MXU contraction (int4
        unpacks in-graph: split-half nibble layout, half the HBM bytes)."""
        if name in params:
            return jnp.einsum(spec, t, params[name].astype(x.dtype))
        if name + "_q4" in params:
            from ssp_x_vit_tpu.ops.pallas.quant_matmul import unpack_int4

            w = unpack_int4(params[name + "_q4"])
        else:
            w = params[name + "_q"]
        y = jnp.einsum(spec, t, w.astype(x.dtype))
        return y * params[name + "_scale"].astype(x.dtype).reshape(scale_shape)

    g = expert_mm("td,edf->tef", xt, "gate_kernel", (1, E, -1))
    u = expert_mm("td,edf->tef", xt, "up_kernel", (1, E, -1))
    y = expert_mm("tef,efd->ted", jax.nn.silu(g) * u, "down_kernel",
                  (1, E, -1))                                  # [T, E, d]
    out = jnp.einsum("te,ted->td", sel, y).reshape(b, s, d)

    # load counts membership in the top-k (GShard/mixtral convention) — a
    # primary-expert-only count would leave second-slot routing
    # unregularized by the balance loss
    member = (sel > 0).astype(jnp.float32) if cfg.top_k > 1 else \
        jax.nn.one_hot(jnp.argmax(probs, axis=-1), E, dtype=jnp.float32)
    load = jnp.mean(member, axis=0)
    aux = {
        "load": load,
        "dropped": jnp.zeros((), jnp.float32),
        "aux_loss": E * jnp.sum(load * jnp.mean(probs, axis=0)),
    }
    return out, aux
