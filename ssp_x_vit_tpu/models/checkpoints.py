"""Checkpoint loaders: HF ViT (safetensors/torch), timm/AugReg ``.npz`` -> pytree.

Replaces the reference's checkpoint-provisioning side-layer (SURVEY.md §1):
HF ``from_pretrained`` (experiments/vit_pruning/auto_2ssp.py:541-543), timm
AugReg ``.npz`` loading (pruning_srp-main/process_models.py:11-53) and the
timm->HF weight transfer ``timm2transformers``
(experiments/vit_pruning/auto_2ssp.py:429-456). Here every source converges on
ONE pytree layout (models/vit.py): stacked blocks, fused QKV, [in, out]
kernels — so there is no cross-framework "transfer" step, just per-source
readers. All readers are pure numpy + safetensors/zip parsing; no torch or
timm needed at load time (torch checkpoints are read via ``torch.load`` only
if the file is a pickle).

Weight-layout conventions handled here:
- torch ``nn.Linear.weight`` is [out, in]  -> transposed to [in, out]
- torch conv patch-proj [d, C, P, P]       -> [C*P*P, d] (matches ops.common.patchify)
- AugReg npz conv kernel [P, P, C, d]      -> [C*P*P, d]
- AugReg npz attention kernels [d, h, hd]  -> fused [d, 3d]
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ssp_x_vit_tpu.models.vit import Params, ViTConfig


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] -> kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def config_from_hf_dict(d: Dict[str, Any], num_classes: Optional[int] = None) -> ViTConfig:
    return ViTConfig(
        image_size=d.get("image_size", 224),
        patch_size=d.get("patch_size", 16),
        num_channels=d.get("num_channels", 3),
        hidden_size=d.get("hidden_size", 768),
        num_layers=d.get("num_hidden_layers", 12),
        num_heads=d.get("num_attention_heads", 12),
        intermediate_size=d.get("intermediate_size", 3072),
        num_classes=num_classes if num_classes is not None else d.get("num_labels", len(d.get("id2label", {})) or 1000),
        layernorm_eps=d.get("layer_norm_eps", 1e-12),
    )


def _read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (header json + raw buffer), numpy only."""
    import struct

    dtypes = {
        "F32": np.float32, "F16": np.float16, "BF16": None, "F64": np.float64,
        "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
        "U8": np.uint8, "BOOL": np.bool_,
    }
    out = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
        base = 8 + n
        data = np.memmap(path, dtype=np.uint8, mode="r")
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            start, end = meta["data_offsets"]
            raw = np.asarray(data[base + start : base + end])
            if meta["dtype"] == "BF16":
                u16 = raw.view(np.uint16)
                u32 = u16.astype(np.uint32) << 16
                arr = u32.view(np.float32).astype(np.float32)
            else:
                arr = raw.view(dtypes[meta["dtype"]])
            out[name] = arr.reshape(meta["shape"]).copy()
    return out


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a HF checkpoint file: .safetensors (numpy) or torch .bin/.pt."""
    if path.endswith(".safetensors"):
        return _read_safetensors(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def params_from_hf_state_dict(
    sd: Dict[str, np.ndarray], cfg: ViTConfig, dtype=jnp.float32
) -> Params:
    """HF ViTForImageClassification / ViTModel state dict -> stacked pytree."""
    pre = "vit." if any(k.startswith("vit.") for k in sd) else ""
    d, L = cfg.hidden_size, cfg.num_layers

    def g(key):
        return np.asarray(sd[pre + key], np.float32)

    patch_w = g("embeddings.patch_embeddings.projection.weight")  # [d, C, P, P]
    patch_kernel = patch_w.reshape(d, -1).T  # flatten (C,P,P) -> rows

    def stack(fmt, transform=lambda x: x):
        return np.stack([transform(g(fmt.format(i=i))) for i in range(L)])

    qkv_kernel = np.stack([
        np.concatenate([
            _t(g(f"encoder.layer.{i}.attention.attention.query.weight")),
            _t(g(f"encoder.layer.{i}.attention.attention.key.weight")),
            _t(g(f"encoder.layer.{i}.attention.attention.value.weight")),
        ], axis=1)
        for i in range(L)
    ])
    qkv_bias = np.stack([
        np.concatenate([
            g(f"encoder.layer.{i}.attention.attention.query.bias"),
            g(f"encoder.layer.{i}.attention.attention.key.bias"),
            g(f"encoder.layer.{i}.attention.attention.value.bias"),
        ])
        for i in range(L)
    ])

    blocks = {
        "ln1_scale": stack("encoder.layer.{i}.layernorm_before.weight"),
        "ln1_bias": stack("encoder.layer.{i}.layernorm_before.bias"),
        "qkv_kernel": qkv_kernel,
        "qkv_bias": qkv_bias,
        "proj_kernel": stack("encoder.layer.{i}.attention.output.dense.weight", _t),
        "proj_bias": stack("encoder.layer.{i}.attention.output.dense.bias"),
        "ln2_scale": stack("encoder.layer.{i}.layernorm_after.weight"),
        "ln2_bias": stack("encoder.layer.{i}.layernorm_after.bias"),
        "fc1_kernel": stack("encoder.layer.{i}.intermediate.dense.weight", _t),
        "fc1_bias": stack("encoder.layer.{i}.intermediate.dense.bias"),
        "fc2_kernel": stack("encoder.layer.{i}.output.dense.weight", _t),
        "fc2_bias": stack("encoder.layer.{i}.output.dense.bias"),
    }

    params: Params = {
        "patch_embed": {"kernel": jnp.asarray(patch_kernel, dtype),
                        "bias": jnp.asarray(g("embeddings.patch_embeddings.projection.bias"), dtype)},
        "cls_token": jnp.asarray(g("embeddings.cls_token"), dtype),
        "pos_embed": jnp.asarray(g("embeddings.position_embeddings"), dtype),
        "blocks": {k: jnp.asarray(v, dtype) for k, v in blocks.items()},
        "ln_final_scale": jnp.asarray(g("layernorm.weight"), dtype),
        "ln_final_bias": jnp.asarray(g("layernorm.bias"), dtype),
    }

    if "classifier.weight" in sd:
        params["head"] = {
            "kernel": jnp.asarray(_t(np.asarray(sd["classifier.weight"], np.float32)), dtype),
            "bias": jnp.asarray(np.asarray(sd["classifier.bias"], np.float32), dtype),
        }
    else:  # headless backbone: identity-shaped zero head filled in by caller
        params["head"] = {
            "kernel": jnp.zeros((d, cfg.num_classes), dtype),
            "bias": jnp.zeros((cfg.num_classes,), dtype),
        }
    return params


def load_hf_vit(model_dir: str, *, num_classes: Optional[int] = None, dtype=jnp.float32) -> Tuple[Params, ViTConfig]:
    """Load a locally saved HF ViT directory (config.json + weights)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = config_from_hf_dict(json.load(f), num_classes=num_classes)
    for fname in ("model.safetensors", "pytorch_model.bin"):
        path = os.path.join(model_dir, fname)
        if os.path.exists(path):
            sd = load_state_dict_file(path)
            return params_from_hf_state_dict(sd, cfg, dtype), cfg
    raise FileNotFoundError(f"no weights file in {model_dir}")


def export_hf_vit(out_dir: str, params: Params, cfg: ViTConfig) -> str:
    """Export a (dense or stage-1-width-pruned) ViT pytree as an HF
    ViTForImageClassification checkpoint (config.json + model.safetensors)
    — inverse of ``params_from_hf_state_dict``: fused qkv re-split into
    query/key/value, matmul patchify folded back to the conv kernel.

    The reference ships pruned ViTs with ``save_pretrained``
    (experiments/vit_pruning/auto_2ssp.py save paths); this is the
    TPU-native counterpart. Width-pruned pytrees export at the PADDED
    uniform intermediate size — the zero-padded neurons are mathematically
    inert (zero fc2 columns), so HF's forward is logit-exact; the logical
    per-block sizes live only in the framework-native artifact. Refused:
    adapter heads and stage-2 attention removal (vanilla HF ViT blocks
    cannot skip attention; use models/persistence.py).
    """
    if cfg.head_type != "linear":
        raise ValueError("adapter heads have no HF ViT encoding; use "
                         "save_pruned_model (models/persistence.py)")
    if cfg.pruned_attention_blocks:
        raise ValueError("stage-2 attention removal is not representable in "
                         "vanilla HF ViT blocks; use save_pruned_model")
    os.makedirs(out_dir, exist_ok=True)
    d, L, C, P_ = cfg.hidden_size, cfg.num_layers, cfg.num_channels, cfg.patch_size
    blocks = params["blocks"]

    def b(key, i, transform=lambda x: x):
        return np.ascontiguousarray(
            transform(np.asarray(blocks[key][i], np.float32)))

    tensors: Dict[str, np.ndarray] = {}
    pre = "vit."
    patch_kernel = np.asarray(params["patch_embed"]["kernel"], np.float32)
    tensors[pre + "embeddings.patch_embeddings.projection.weight"] = \
        np.ascontiguousarray(patch_kernel.T.reshape(d, C, P_, P_))
    tensors[pre + "embeddings.patch_embeddings.projection.bias"] = \
        np.asarray(params["patch_embed"]["bias"], np.float32)
    tensors[pre + "embeddings.cls_token"] = np.asarray(
        params["cls_token"], np.float32).reshape(1, 1, d)
    tensors[pre + "embeddings.position_embeddings"] = np.asarray(
        params["pos_embed"], np.float32).reshape(1, -1, d)
    for i in range(L):
        lp = pre + f"encoder.layer.{i}."
        qkv_k = b("qkv_kernel", i)  # [d, 3d]
        qkv_b = b("qkv_bias", i)
        for j, name in enumerate(("query", "key", "value")):
            tensors[lp + f"attention.attention.{name}.weight"] = \
                np.ascontiguousarray(_t(qkv_k[:, j * d:(j + 1) * d]))
            tensors[lp + f"attention.attention.{name}.bias"] = \
                np.ascontiguousarray(qkv_b[j * d:(j + 1) * d])
        tensors[lp + "attention.output.dense.weight"] = b("proj_kernel", i, _t)
        tensors[lp + "attention.output.dense.bias"] = b("proj_bias", i)
        tensors[lp + "layernorm_before.weight"] = b("ln1_scale", i)
        tensors[lp + "layernorm_before.bias"] = b("ln1_bias", i)
        tensors[lp + "layernorm_after.weight"] = b("ln2_scale", i)
        tensors[lp + "layernorm_after.bias"] = b("ln2_bias", i)
        tensors[lp + "intermediate.dense.weight"] = b("fc1_kernel", i, _t)
        tensors[lp + "intermediate.dense.bias"] = b("fc1_bias", i)
        tensors[lp + "output.dense.weight"] = b("fc2_kernel", i, _t)
        tensors[lp + "output.dense.bias"] = b("fc2_bias", i)
    tensors[pre + "layernorm.weight"] = np.asarray(params["ln_final_scale"], np.float32)
    tensors[pre + "layernorm.bias"] = np.asarray(params["ln_final_bias"], np.float32)
    tensors["classifier.weight"] = np.ascontiguousarray(
        _t(np.asarray(params["head"]["kernel"], np.float32)))
    tensors["classifier.bias"] = np.asarray(params["head"]["bias"], np.float32)

    _write_safetensors(os.path.join(out_dir, "model.safetensors"), tensors,
                       metadata={"format": "pt"})
    hf_cfg = {
        "model_type": "vit",
        "architectures": ["ViTForImageClassification"],
        "image_size": cfg.image_size, "patch_size": cfg.patch_size,
        "num_channels": cfg.num_channels, "hidden_size": d,
        "num_hidden_layers": L, "num_attention_heads": cfg.num_heads,
        "intermediate_size": cfg.padded_intermediate_size,
        "layer_norm_eps": cfg.layernorm_eps,
        "num_labels": cfg.num_classes,
        "id2label": {str(i): f"LABEL_{i}" for i in range(cfg.num_classes)},
        "label2id": {f"LABEL_{i}": i for i in range(cfg.num_classes)},
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return out_dir


def params_from_augreg_npz(
    npz: Dict[str, np.ndarray], cfg: ViTConfig, dtype=jnp.float32
) -> Params:
    """AugReg GCS ``.npz`` checkpoint (big_vision layout) -> stacked pytree.

    This subsumes the reference's timm loading + ``timm2transformers`` fused-qkv
    split (auto_2ssp.py:429-456): the npz attention kernels are [d, h, hd] per
    q/k/v; we fuse them directly into the [d, 3d] qkv kernel.
    """
    d, L = cfg.hidden_size, cfg.num_layers

    def g(key):
        return np.asarray(npz[key], np.float32)

    patch = g("embedding/kernel")  # [P, P, C, d]
    patch_kernel = patch.transpose(2, 0, 1, 3).reshape(-1, d)  # (C,P,P) rows

    def attn_k(i, name):
        w = g(f"Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1/{name}/kernel")
        return w.reshape(d, -1)  # [d, h*hd]

    def attn_b(i, name):
        return g(f"Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1/{name}/bias").reshape(-1)

    blocks = {
        "ln1_scale": np.stack([g(f"Transformer/encoderblock_{i}/LayerNorm_0/scale") for i in range(L)]),
        "ln1_bias": np.stack([g(f"Transformer/encoderblock_{i}/LayerNorm_0/bias") for i in range(L)]),
        "qkv_kernel": np.stack([
            np.concatenate([attn_k(i, "query"), attn_k(i, "key"), attn_k(i, "value")], axis=1)
            for i in range(L)
        ]),
        "qkv_bias": np.stack([
            np.concatenate([attn_b(i, "query"), attn_b(i, "key"), attn_b(i, "value")])
            for i in range(L)
        ]),
        "proj_kernel": np.stack([
            g(f"Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1/out/kernel").reshape(-1, d)
            for i in range(L)
        ]),
        "proj_bias": np.stack([
            g(f"Transformer/encoderblock_{i}/MultiHeadDotProductAttention_1/out/bias") for i in range(L)
        ]),
        "ln2_scale": np.stack([g(f"Transformer/encoderblock_{i}/LayerNorm_2/scale") for i in range(L)]),
        "ln2_bias": np.stack([g(f"Transformer/encoderblock_{i}/LayerNorm_2/bias") for i in range(L)]),
        "fc1_kernel": np.stack([g(f"Transformer/encoderblock_{i}/MlpBlock_3/Dense_0/kernel") for i in range(L)]),
        "fc1_bias": np.stack([g(f"Transformer/encoderblock_{i}/MlpBlock_3/Dense_0/bias") for i in range(L)]),
        "fc2_kernel": np.stack([g(f"Transformer/encoderblock_{i}/MlpBlock_3/Dense_1/kernel") for i in range(L)]),
        "fc2_bias": np.stack([g(f"Transformer/encoderblock_{i}/MlpBlock_3/Dense_1/bias") for i in range(L)]),
    }

    params: Params = {
        "patch_embed": {"kernel": jnp.asarray(patch_kernel, dtype),
                        "bias": jnp.asarray(g("embedding/bias"), dtype)},
        "cls_token": jnp.asarray(g("cls"), dtype),
        "pos_embed": jnp.asarray(g("Transformer/posembed_input/pos_embedding"), dtype),
        "blocks": {k: jnp.asarray(v, dtype) for k, v in blocks.items()},
        "ln_final_scale": jnp.asarray(g("Transformer/encoder_norm/scale"), dtype),
        "ln_final_bias": jnp.asarray(g("Transformer/encoder_norm/bias"), dtype),
    }

    if "head/kernel" in npz:
        params["head"] = {"kernel": jnp.asarray(g("head/kernel"), dtype),
                         "bias": jnp.asarray(g("head/bias"), dtype)}
    else:
        params["head"] = {"kernel": jnp.zeros((d, cfg.num_classes), dtype),
                          "bias": jnp.zeros((cfg.num_classes,), dtype)}
    return params


def load_augreg_npz(path: str, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    with np.load(path) as npz:
        return params_from_augreg_npz(dict(npz), cfg, dtype)


def _write_safetensors(path: str, tensors: Dict[str, np.ndarray],
                       metadata: Dict[str, str] = None) -> None:
    """Minimal safetensors writer (header json + raw little-endian buffer),
    numpy only — the inverse of ``_read_safetensors``. float32 arrays are
    written as F32; pass arrays pre-converted (e.g. ml_dtypes.bfloat16 views
    as uint16 with dtype_override) via ``np.float32``/``np.float16`` only —
    exporters in this repo emit F32 (exact for the f32 pytrees the pruning
    pipeline produces; HF from_pretrained re-casts per torch_dtype)."""
    import struct

    codes = {np.dtype(np.float32): "F32", np.dtype(np.float16): "F16",
             np.dtype(np.int64): "I64", np.dtype(np.int32): "I32",
             np.dtype(np.int8): "I8", np.dtype(np.uint8): "U8",
             np.dtype(np.bool_): "BOOL"}
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = metadata
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in codes:
            raise ValueError(f"unsupported export dtype {arr.dtype} for {name}")
        raw = arr.tobytes()
        header[name] = {"dtype": codes[arr.dtype], "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        offset += len(raw)
        blobs.append(raw)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for raw in blobs:
            f.write(raw)


def save_params_npz(path: str, params: Params) -> None:
    """Flatten the pytree to 'a/b/c' keys and save as npz (framework-native)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez(path, **flat)


def load_params_npz(path: str, dtype=jnp.float32) -> Params:
    """``dtype`` applies to FLOAT leaves only; integer leaves (int8 quantized
    weights/codes, index arrays) keep their stored dtype so quantized
    pytrees (llm/quant.py, models/quant.py) round-trip losslessly."""
    with np.load(path) as npz:
        out: Params = {}
        for key in npz.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            arr = npz[key]
            if arr.dtype.kind == "V" and arr.dtype.itemsize == 2:
                # np.savez stores bfloat16 leaves (ml_dtypes extension
                # dtype) with a raw '|V2' descr — the bytes are intact,
                # only the type tag is lost. bf16 is the sole 2-byte
                # non-numpy dtype we ever save; restore it by view.
                import ml_dtypes

                arr = arr.view(ml_dtypes.bfloat16)
            leaf_dtype = dtype if jnp.issubdtype(arr.dtype, jnp.floating) else None
            node[parts[-1]] = jnp.asarray(arr, leaf_dtype)
    return out
