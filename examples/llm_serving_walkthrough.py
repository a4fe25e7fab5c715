"""End-to-end LLM serving walkthrough: prune -> quantize -> pack -> persist
-> serve (contiguous, paged/continuous, speculative).

Runnable offline on CPU in a few minutes (tiny config); every step is the
same API you would use at 7B scale on a TPU pod — only the config numbers
change. Mirrors the role of the reference's notebooks (SURVEY.md §2.6) for
the rebuild's beyond-reference serving subsystem.

  python examples/llm_serving_walkthrough.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.llm.checkpoints import load_llm_model, save_llm_model
from ssp_x_vit_tpu.llm.model import LlamaConfig, init_llama_params
from ssp_x_vit_tpu.llm.paged import PagedServer
from ssp_x_vit_tpu.llm.pruning import two_stage_2ssp
from ssp_x_vit_tpu.llm.quant import quantize_llm_params_int8
from ssp_x_vit_tpu.llm.serve import generate_kv_scan, pack_llm_params_for_serving
from ssp_x_vit_tpu.llm.speculative import speculative_generate

# 1. a dense model (load_hf_llama at real scale; random-init here)
cfg = LlamaConfig(vocab_size=512, hidden_size=64, num_layers=4, num_heads=4,
                  num_kv_heads=2, intermediate_size=128)
params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
print(f"dense: L={cfg.num_layers} d={cfg.hidden_size} f={cfg.intermediate_size}")

# 2. 2SSP-prune it (37.5% global sparsity; synthetic calibration)
calib = [np.random.default_rng(i).integers(1, cfg.vocab_size, (1, 64))
         for i in range(4)]
pruned, pruned_cfg, info = two_stage_2ssp(params, cfg, calib, 0.375,
                                          seq_len=64)
print(f"pruned: kept FFN width {pruned_cfg.pruned_intermediate_size}, "
      f"attention removed in blocks {list(pruned_cfg.pruned_attention_blocks)}")

# 3. quantize (int8 weights) + fuse serving projections, then persist
artifact = pack_llm_params_for_serving(
    quantize_llm_params_int8(pruned, pruned_cfg), pruned_cfg)
out_dir = os.path.join(tempfile.gettempdir(), "llm_serving_demo")
save_llm_model(out_dir, artifact, pruned_cfg)
print(f"deployment artifact saved to {out_dir}")

# 4. reload and serve — contiguous batched generation with int8 KV cache
srv_params, srv_cfg = load_llm_model(out_dir, dtype=jnp.float32)
prompts = [[7, 11, 13], [42, 42]]
outs = generate_kv_scan(srv_params, srv_cfg, prompts, max_length=24,
                        cache_dtype=jnp.int8)
print("contiguous int8-KV generations:", [o.tolist()[:8] for o in outs])

# 5. continuous batching: requests arrive over time, pages alloc/free
server = PagedServer(srv_params, srv_cfg, max_batch=2, num_pages=64,
                     page_size=8, max_context=128, cache_dtype=jnp.float32)
server.add_request([3, 1, 4, 1, 5], max_new_tokens=8)
server.add_request([9, 2, 6], max_new_tokens=6)
while server.step():
    pass
print("continuous-batching results:",
      {rid: seq.tolist()[:8] for rid, seq in server.finished.items()})

# 6. speculative: the pruned artifact drafts for the DENSE model — output is
# exactly the dense model's greedy generation, faster when they agree
out, stats = speculative_generate(params, cfg, srv_params, srv_cfg,
                                  np.asarray([7, 11, 13], np.int32),
                                  max_length=24, k=3, cache_dtype=jnp.float32)
ref = generate_kv_scan(params, cfg, np.asarray([7, 11, 13], np.int32),
                       max_length=24, cache_dtype=jnp.float32)
assert np.array_equal(out, np.asarray(ref)), "speculative must equal dense"
print(f"speculative == dense greedy; acceptance {stats['acceptance_rate']:.2f} "
      f"({stats['rounds']} rounds)")
print("WALKTHROUGH OK")
