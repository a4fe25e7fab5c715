"""Golden-output regression fixtures (SURVEY.md §4: the reference's testing
relies on recorded outputs; here the goldens are deterministic tiny-config
numbers recorded on the CPU backend at f32).

Purpose: catch UNINTENDED numerics drift — an innocent-looking refactor of
rms_norm, rope, the scan body, or init RNG draw order changes these values
(round 3 actually shipped and then reverted such an init-order drift).
Tolerances are loose enough (1e-3 relative) to survive jax version bumps
that reorder reductions, tight enough to flag real changes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.datasets import synthetic_token_stream
from ssp_x_vit_tpu.llm.evaluation import evaluate_perplexity
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward


def test_llama_synthetic_perplexity_golden():
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
                      num_kv_heads=2, intermediate_size=64)
    params = init_llama_params(jax.random.PRNGKey(42), cfg)
    stream = synthetic_token_stream(96 * 8, cfg.vocab_size, seed=7)
    ppl = evaluate_perplexity(params, cfg, stream, seq_len=48)
    np.testing.assert_allclose(ppl, 97.30785, rtol=1e-3)


def test_vit_forward_golden():
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=4,
                    num_heads=4, intermediate_size=128, num_classes=10)
    params = init_vit_params(jax.random.PRNGKey(42), cfg)
    px = jax.random.normal(jax.random.PRNGKey(43), (2, 32, 32, 3), jnp.float32)
    logits, _ = vit_forward(params, px, cfg)
    np.testing.assert_allclose(float(jnp.sum(logits)), 1.102771, rtol=1e-3)
    np.testing.assert_allclose(float(logits[0, 0]), 0.140662, rtol=1e-3)
