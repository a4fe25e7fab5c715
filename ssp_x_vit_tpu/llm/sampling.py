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
