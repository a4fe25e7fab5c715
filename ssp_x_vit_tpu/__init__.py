"""ssp_x_vit_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of the 2SSP-X-ViT framework.

This is the importable package name for the `2ssp-x-vit_tpu` framework (a Python
package cannot start with a digit or contain dashes).

Capability map vs the reference (see SURVEY.md for the full inventory):

- ``models``     — functional JAX ViT (+ causal LM in ``llm``) with recompile-free
                   per-block skip masks and per-block FFN neuron masks baked into the
                   forward pass (replaces torch monkey-patching / deepcopy idioms,
                   reference src/utilities.py:69-135, src/vit_pruning.py:416-429).
- ``ops``        — TPU compute layer: jnp reference ops + Pallas kernels
                   (flash attention, fused FFN with importance side-output).
- ``pruning``    — 2SSP stage-1 width / stage-2 depth, planner, interface layer
                   (reference src/pruning.py, src/vit_pruning.py,
                   pruning_srp-main/mask_conjunction.py).
- ``masks``      — mask algebra: normalize / summation / consensus / conjunction
                   (reference manual-experiments/*.py).
- ``data``       — CIFAR/imagefolder input pipeline with deterministic synthetic
                   fallback for offline runs.
- ``evaluation`` — top-1 / perplexity / latency harness / report writer
                   (reference src/evaluation.py, src/vit_pruning.py:326-373,888-946).
- ``parallel``   — device mesh + sharding helpers (GSPMD/pjit); replaces the
                   reference's accelerate device_map dispatch (src/slicegpt_utils/
                   gpu_utils.py:70-91) with jax.sharding over ICI.
- ``llm``        — causal-LM (Llama-class) path: 2SSP + depth-pruning baselines.
- ``cli``        — argparse drivers mirroring the reference entry points
                   (main.py, experiments/vit_pruning/auto_2ssp.py,
                   experiments/vit_pruning/apply_mask_prune.py).
"""

__version__ = "0.1.0"
