"""SRP provisioning: index.csv selection, AugReg npz loading, dataset loader."""

import numpy as np
import pytest

from ssp_x_vit_tpu.data.srp import select_srp_checkpoint, load_srp_model, load_srp_dataset


@pytest.fixture
def index_csv(tmp_path):
    rows = [
        "name,ds,filename,final_val,adapt_ds,adapt_filename,adapt_final_val",
        # i21k pretrains: B/16 has two, best final_val = p2
        "B/16,i21k,p1,0.80,,,",
        "B/16,i21k,p2,0.85,,,",
        "S/16,i21k,p3,0.70,,,",
        # finetunes of p2 on cifar100 (val ascending c1 < c2 < c3)
        "B/16,cifar100,p2,0,cifar100,ckpt_c1_224,0.90",
        "B/16,cifar100,p2,0,cifar100,ckpt_c2_224,0.92",
        "B/16,cifar100,p2,0,cifar100,ckpt_c3_224,0.95",
        # finetune of the WORSE pretrain p1 — must be excluded
        "B/16,cifar100,p1,0,cifar100,ckpt_bad_224,0.99",
        # different dataset
        "B/16,oxford-iiit-pet,p2,0,oxford-iiit-pet,ckpt_pet_224,0.88",
        # different arch
        "S/16,cifar100,p3,0,cifar100,ckpt_s_224,0.91",
    ]
    p = tmp_path / "index.csv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_select_best(index_csv):
    assert select_srp_checkpoint(index_csv, "B/16", "cifar100", top10_idx=1) == "ckpt_c3_224"


def test_select_rank(index_csv):
    assert select_srp_checkpoint(index_csv, "B/16", "cifar100", top10_idx=2) == "ckpt_c2_224"
    assert select_srp_checkpoint(index_csv, "B/16", "cifar100", top10_idx=3) == "ckpt_c1_224"


def test_select_excludes_worse_pretrain_finetunes(index_csv):
    picks = {select_srp_checkpoint(index_csv, "B/16", "cifar100", i) for i in (1, 2, 3)}
    assert "ckpt_bad_224" not in picks


def test_select_other_dataset_and_arch(index_csv):
    assert select_srp_checkpoint(index_csv, "B/16", "oxford-iiit-pet") == "ckpt_pet_224"
    assert select_srp_checkpoint(index_csv, "S/16", "cifar100") == "ckpt_s_224"


def test_select_out_of_range(index_csv):
    with pytest.raises(ValueError):
        select_srp_checkpoint(index_csv, "B/16", "cifar100", top10_idx=4)


def test_load_srp_model_from_npz(tmp_path):
    """Round-trip: synthesize an AugReg-layout npz and load it (Ti/16)."""
    import jax
    from ssp_x_vit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    import jax.numpy as jnp

    d, L, heads, f, P, C = 192, 12, 3, 768, 16, 37
    rng = np.random.default_rng(0)
    npz = {
        "embedding/kernel": rng.normal(size=(P, P, 3, d)).astype(np.float32) * 0.02,
        "embedding/bias": np.zeros(d, np.float32),
        "cls": rng.normal(size=(1, 1, d)).astype(np.float32) * 0.02,
        "Transformer/posembed_input/pos_embedding":
            rng.normal(size=(1, 197, d)).astype(np.float32) * 0.02,
        "Transformer/encoder_norm/scale": np.ones(d, np.float32),
        "Transformer/encoder_norm/bias": np.zeros(d, np.float32),
        "head/kernel": rng.normal(size=(d, C)).astype(np.float32) * 0.02,
        "head/bias": np.zeros(C, np.float32),
    }
    hd = d // heads
    for i in range(L):
        pre = f"Transformer/encoderblock_{i}"
        att = f"{pre}/MultiHeadDotProductAttention_1"
        for nm in ("query", "key", "value"):
            npz[f"{att}/{nm}/kernel"] = rng.normal(size=(d, heads, hd)).astype(np.float32) * 0.02
            npz[f"{att}/{nm}/bias"] = np.zeros((heads, hd), np.float32)
        npz[f"{att}/out/kernel"] = rng.normal(size=(heads, hd, d)).astype(np.float32) * 0.02
        npz[f"{att}/out/bias"] = np.zeros(d, np.float32)
        npz[f"{pre}/LayerNorm_0/scale"] = np.ones(d, np.float32)
        npz[f"{pre}/LayerNorm_0/bias"] = np.zeros(d, np.float32)
        npz[f"{pre}/LayerNorm_2/scale"] = np.ones(d, np.float32)
        npz[f"{pre}/LayerNorm_2/bias"] = np.zeros(d, np.float32)
        npz[f"{pre}/MlpBlock_3/Dense_0/kernel"] = rng.normal(size=(d, f)).astype(np.float32) * 0.02
        npz[f"{pre}/MlpBlock_3/Dense_0/bias"] = np.zeros(f, np.float32)
        npz[f"{pre}/MlpBlock_3/Dense_1/kernel"] = rng.normal(size=(f, d)).astype(np.float32) * 0.02
        npz[f"{pre}/MlpBlock_3/Dense_1/bias"] = np.zeros(d, np.float32)
    path = tmp_path / "augreg.npz"
    np.savez(path, **npz)

    params, cfg = load_srp_model("Ti/16", "oxford-iiit-pet", checkpoint_npz=str(path))
    assert cfg.hidden_size == 192 and cfg.num_classes == 37
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    logits, _ = vit_forward(params, px, cfg)
    assert logits.shape == (1, 37)
    assert np.isfinite(np.asarray(logits)).all()


def test_srp_dataset_loader_synthetic():
    train, val = load_srp_dataset("cifar100", split="trainval", res=32, batch_size=16)
    b = next(iter(train))
    assert b["pixel_values"].shape == (16, 32, 32, 3)
    test = load_srp_dataset("oxford-iiit-pet", split="test", res=32, batch_size=8)
    b = next(iter(test))
    assert b["pixel_values"].shape[1:] == (32, 32, 3)
