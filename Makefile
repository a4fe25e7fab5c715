# Pinned-reproducible trained-weights artifacts (VERDICT r4 #5).
#
# Every trained-weights number in docs/trained_bench.json /
# docs/trained_vit_bench.json regenerates from these targets with fixed
# seeds. The corpus builder is deterministic GIVEN this host's Python
# installation (seeded shuffle over a sorted file walk); the committed
# ckpts/code_llm_small/corpus_slice/ holds the exact train/val token slices
# the committed checkpoint was measured with, so re-measurement needs no
# corpus rebuild at all.

PY := python

# ---- corpus (≈110M train tokens from host Python sources, ~10 min CPU) ----
reproduce-corpus:
	$(PY) scripts/prepare_code_corpus.py --out artifacts/code_corpus

# ---- small committed LM (ckpts/code_llm_small, bf16 npz, ~38 MB) ----------
# Measured (TPU, seed 0, 2026-08-21): final train loss 4.32, held-out
# val_ppl_16k 115.58 pinned in ckpts/code_llm_small/train_meta.json —
# tests/test_trained_ckpt.py re-measures it at ±5% every CI run.
reproduce-trained-llm-small: reproduce-corpus
	$(PY) -m ssp_x_vit_tpu.cli.train_llm \
	  --init-json ckpts/code_llm_small/model_config.json \
	  --data-bin artifacts/code_corpus/train.bin \
	  --steps 3000 --batch-size 8 --seq-len 1024 --lr 6e-4 --warmup 100 \
	  --schedule cosine --grad-clip 1.0 --seed 0 \
	  --save-model ckpts/code_llm_small --save-format native
	$(PY) scripts/finalize_trained_ckpt.py --ckpt ckpts/code_llm_small \
	  --corpus artifacts/code_corpus \
	  --meta-extra '{"steps": 3000, "batch": 8, "seq_len": 1024, "lr": 6e-4, "seed": 0}'
	$(PY) scripts/bench_trained.py --ckpt ckpts/code_llm_small \
	  --corpus ckpts/code_llm_small/corpus_slice \
	  --out docs/trained_bench_small.json

# ---- 197M LLM (docs/trained_bench.json '197m' rows; ~20 min TPU) ----------
reproduce-trained-llm-197m: reproduce-corpus
	$(PY) -m ssp_x_vit_tpu.cli.train_llm \
	  --init-json docs/code_llm_197m_config.json \
	  --data-bin artifacts/code_corpus/train.bin \
	  --steps 3000 --batch-size 8 --seq-len 2048 --lr 3e-4 --warmup 100 \
	  --schedule cosine --grad-clip 1.0 --seed 0 \
	  --save-model artifacts/code_llm_197m --save-format native
	$(PY) scripts/bench_trained.py --ckpt artifacts/code_llm_197m \
	  --corpus artifacts/code_corpus

# ---- trained ViT (ckpts/vit_procgen, committed; corpus is procedural) ------
reproduce-trained-vit:
	$(PY) scripts/train_vit_procgen.py --out ckpts/vit_procgen --seed 0
	$(PY) scripts/bench_trained_vit.py --ckpt ckpts/vit_procgen

.PHONY: reproduce-corpus reproduce-trained-llm-small \
        reproduce-trained-llm-197m reproduce-trained-vit
