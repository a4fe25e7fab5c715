"""Sampling parameters and logit transforms for the serving paths.

The production-serving sampler surface (vLLM SamplingParams semantics, HF
LogitsProcessor numerics): temperature / top-k / top-p / min-p filtering plus
repetition, presence, and frequency penalties. The reference only ever decodes
greedy or 5-beam through HF generate (src/evaluation.py:152-171); a serving
framework needs the full knob set, in-graph, scan-compatible.

Penalty semantics (vLLM convention):
- ``repetition_penalty`` applies to tokens present in the PROMPT or generated
  so far: positive logits divided by p, negative multiplied (HF
  RepetitionPenaltyLogitsProcessor numerics).
- ``presence_penalty`` / ``frequency_penalty`` apply to GENERATED tokens only
  (OpenAI semantics): logits -= presence*1[count>0] + frequency*count.

State is two [b, V] buffers (prompt presence mask, generated counts) carried
through the decode scan — a scatter-add per step, negligible next to the
matmuls. All transforms are pure jnp on [b, V] logits: they ride ``lax.scan``
decode loops and jit without retraces (SamplingParams is frozen/hashable and
rides static_argnames).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Static (hashable) sampling configuration for one generation call.

    ``temperature <= 0`` selects greedy argmax (filters are irrelevant and
    skipped); penalties apply in BOTH regimes (greedy with a repetition
    penalty is a common anti-loop setting).
    """

    temperature: float = 0.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    min_p: Optional[float] = None
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0

    def __post_init__(self):
        if self.top_p is not None and not (0.0 < self.top_p <= 1.0):
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.min_p is not None and not (0.0 <= self.min_p <= 1.0):
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if self.repetition_penalty <= 0.0:
            raise ValueError("repetition_penalty must be > 0 (1.0 = off), "
                             f"got {self.repetition_penalty}")

    @property
    def needs_counts(self) -> bool:
        """True when the decode loop must carry the [b, V] penalty buffers."""
        return (self.repetition_penalty != 1.0
                or self.presence_penalty != 0.0
                or self.frequency_penalty != 0.0)

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def init_penalty_state(prompt_tokens: jax.Array, valid: jax.Array,
                       vocab_size: int):
    """(prompt presence mask [b, V] f32, generated counts [b, V] f32) from
    LEFT-padded prompt tokens [b, p] and a validity mask [b, p] (pad slots
    False — pad id 0 is a real vocab token and must not be penalized)."""
    b = prompt_tokens.shape[0]
    rows = jnp.arange(b)[:, None]
    prompt_mask = jnp.zeros((b, vocab_size), jnp.float32).at[
        rows, prompt_tokens].max(valid.astype(jnp.float32))
    counts = jnp.zeros((b, vocab_size), jnp.float32)
    return prompt_mask, counts


def update_counts(counts: jax.Array, token: jax.Array) -> jax.Array:
    """Scatter-add the newly generated token [b] into the counts [b, V]."""
    b = counts.shape[0]
    return counts.at[jnp.arange(b), token].add(1.0)


def apply_penalties(logits: jax.Array, prompt_mask: jax.Array,
                    counts: jax.Array, sp: SamplingParams) -> jax.Array:
    """Penalty transforms on [b, V] logits (before temperature/filters)."""
    if sp.repetition_penalty != 1.0:
        seen = jnp.logical_or(prompt_mask > 0, counts > 0)
        rp = sp.repetition_penalty
        penalized = jnp.where(logits > 0, logits / rp, logits * rp)
        logits = jnp.where(seen, penalized, logits)
    if sp.frequency_penalty != 0.0:
        logits = logits - sp.frequency_penalty * counts
    if sp.presence_penalty != 0.0:
        logits = logits - sp.presence_penalty * (counts > 0).astype(
            logits.dtype)
    return logits


def filter_logits(scaled: jax.Array, sp: SamplingParams) -> jax.Array:
    """top-k / top-p / min-p filters on temperature-scaled logits [b, V]."""
    if sp.top_k is not None:
        kth = jnp.sort(scaled, axis=-1)[:, -sp.top_k][:, None]
        scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)
    if sp.top_p is not None and sp.top_p < 1.0:
        # nucleus: smallest sorted prefix whose mass reaches top_p, INCLUDING
        # the crossing token (HF convention) — top-1 always survives
        srt = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        before = jnp.cumsum(probs, axis=-1) - probs
        kept = jnp.where(before < sp.top_p, srt, jnp.inf)
        thresh = jnp.min(kept, axis=-1, keepdims=True)
        scaled = jnp.where(scaled >= thresh, scaled, -jnp.inf)
    if sp.min_p is not None and sp.min_p > 0.0:
        # keep tokens with prob >= min_p * max_prob (HF MinPLogitsWarper /
        # vLLM min_p): in logit space, scaled >= max_logit + log(min_p)
        max_logit = jnp.max(scaled, axis=-1, keepdims=True)
        scaled = jnp.where(scaled >= max_logit + jnp.log(sp.min_p),
                           scaled, -jnp.inf)
    return scaled


def sample(logits: jax.Array, rng: Optional[jax.Array],
           sp: SamplingParams) -> jax.Array:
    """[b, V] logits (penalties already applied) -> [b] int32 token ids."""
    if sp.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = filter_logits(logits / sp.temperature, sp)
    return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)


# ---------------- vectorized per-row sampling (continuous batching) ----


@dataclasses.dataclass
class SamplerState:
    """Device-resident per-slot sampler state for a continuous-batching
    server (llm/paged.PagedServer): each row belongs to one slot and is
    reset at admit. Not a frozen config — this is mutable runtime state
    (a pytree: rides jit arguments/donation)."""

    keys: jax.Array         # [b, 2] uint32 per-slot PRNG keys
    temperature: jax.Array  # [b] f32, <= 0 -> greedy row
    top_k: jax.Array        # [b] i32, 0 -> disabled
    top_p: jax.Array        # [b] f32, >= 1 -> disabled
    min_p: jax.Array        # [b] f32, 0 -> disabled
    repetition: jax.Array   # [b] f32, 1 -> disabled
    presence: jax.Array     # [b] f32, 0 -> disabled
    frequency: jax.Array    # [b] f32, 0 -> disabled
    prompt_mask: jax.Array  # [b, V] f32 prompt presence
    counts: jax.Array       # [b, V] f32 generated counts


jax.tree_util.register_dataclass(
    SamplerState,
    data_fields=["keys", "temperature", "top_k", "top_p", "min_p",
                 "repetition", "presence", "frequency", "prompt_mask",
                 "counts"],
    meta_fields=[])


def init_sampler_state(max_batch: int, vocab_size: int) -> SamplerState:
    """All-neutral state (greedy rows, empty penalty buffers)."""
    z = lambda *s: jnp.zeros(s, jnp.float32)
    return SamplerState(
        keys=jnp.zeros((max_batch, 2), jnp.uint32),
        temperature=z(max_batch), top_k=jnp.zeros((max_batch,), jnp.int32),
        top_p=jnp.ones((max_batch,), jnp.float32), min_p=z(max_batch),
        repetition=jnp.ones((max_batch,), jnp.float32),
        presence=z(max_batch), frequency=z(max_batch),
        prompt_mask=z(max_batch, vocab_size), counts=z(max_batch, vocab_size))


def slot_state_row(state: SamplerState, i: int, sp: SamplingParams,
                   prompt_tokens, vocab_size: int,
                   seed: Optional[int]) -> SamplerState:
    """Admit-time reset of row ``i`` from a SamplingParams + prompt. One
    small dispatch per field; called once per request."""
    V = vocab_size
    pm = jnp.zeros((V,), jnp.float32).at[
        jnp.asarray(np.asarray(prompt_tokens, np.int32))].set(1.0)
    key = jax.random.PRNGKey(0 if seed is None else seed)[None].astype(
        jnp.uint32)
    return SamplerState(
        keys=state.keys.at[i].set(key[0]),
        temperature=state.temperature.at[i].set(max(sp.temperature, 0.0)),
        top_k=state.top_k.at[i].set(sp.top_k or 0),
        top_p=state.top_p.at[i].set(sp.top_p if sp.top_p is not None else 1.0),
        min_p=state.min_p.at[i].set(sp.min_p or 0.0),
        repetition=state.repetition.at[i].set(sp.repetition_penalty),
        presence=state.presence.at[i].set(sp.presence_penalty),
        frequency=state.frequency.at[i].set(sp.frequency_penalty),
        prompt_mask=state.prompt_mask.at[i].set(pm),
        counts=state.counts.at[i].set(jnp.zeros((V,), jnp.float32)))


def vectorized_sample(logits: jax.Array, state: SamplerState):
    """One compiled program samples EVERY slot mixture: per-row penalties,
    temperature (<=0 -> greedy argmax for that row), top-k/top-p/min-p
    filters, per-row PRNG keys (per-request seeds). Returns (tokens [b]
    i32, new state with advanced keys and updated counts).

    vLLM's vectorized-sampler design point: parameters are TRACED [b]
    vectors, so admitting a request with different knobs never recompiles
    the decode step."""
    b, V = logits.shape
    z = logits.astype(jnp.float32)

    # penalties (neutral values are exact no-ops)
    seen = jnp.logical_or(state.prompt_mask > 0, state.counts > 0)
    rp = state.repetition[:, None]
    z = jnp.where(seen, jnp.where(z > 0, z / rp, z * rp), z)
    z = z - state.frequency[:, None] * state.counts
    z = z - state.presence[:, None] * (state.counts > 0).astype(jnp.float32)

    greedy_tok = jnp.argmax(z, axis=-1).astype(jnp.int32)

    scaled = z / jnp.maximum(state.temperature, 1e-6)[:, None]
    srt = jnp.sort(scaled, axis=-1)[:, ::-1]                     # desc
    # top-k: kth-largest per row (0 -> keep all)
    idx = jnp.clip(state.top_k - 1, 0, V - 1)
    kth = jnp.take_along_axis(srt, idx[:, None], axis=1)
    k_thresh = jnp.where(state.top_k[:, None] > 0, kth, -jnp.inf)
    # top-p: smallest prefix reaching the mass, crossing token included
    probs = jax.nn.softmax(srt, axis=-1)
    before = jnp.cumsum(probs, axis=-1) - probs
    kept = jnp.where(before < state.top_p[:, None], srt, jnp.inf)
    p_thresh = jnp.where(state.top_p[:, None] < 1.0,
                         jnp.min(kept, axis=-1, keepdims=True), -jnp.inf)
    # min-p: prob >= min_p * max_prob <=> logit >= max + log(min_p)
    m_thresh = jnp.where(
        state.min_p[:, None] > 0.0,
        jnp.max(scaled, axis=-1, keepdims=True) + jnp.log(
            jnp.maximum(state.min_p, 1e-30))[:, None],
        -jnp.inf)
    thresh = jnp.maximum(jnp.maximum(k_thresh, p_thresh), m_thresh)
    filtered = jnp.where(scaled >= thresh, scaled, -jnp.inf)

    split = jax.vmap(jax.random.split)(state.keys)               # [b, 2, 2]
    new_keys, subkeys = split[:, 0], split[:, 1]
    sampled_tok = jax.vmap(
        lambda k, row: jax.random.categorical(k, row))(subkeys, filtered
                                                       ).astype(jnp.int32)
    tok = jnp.where(state.temperature > 0.0, sampled_tok, greedy_tok)
    counts = state.counts.at[jnp.arange(b), tok].add(1.0)
    return tok, dataclasses.replace(state, keys=new_keys, counts=counts)
