"""NVScoreVariants reference-compatible CNN architectures (JAX).

Reference behavior: src/main/python/.../scorevariants/models/gatk_1d.py
(GATK_CNN_1D) and gatk_2d.py (GATK_CNN_2D) — the exact architectures whose
pretrained weights GATK ships in resources/large/nvscorevariants/
(1d_cnn_mix_train_full_bn.pt, small_2d.pt). `load_torch_1d/2d` convert a
PyTorch state_dict into the JAX parameter pytree, so the shipped .pt files load
directly; inference here is eval-mode (dropout = identity, batch-norm uses
running statistics).

Inputs (scorevariants/encoders.py): reference window = 128 bases one-hot
(BASE_MAP A,C,G,T), annotation vector BEST_PRACTICES =
[MQ, DP, SOR, FS, QD, MQRankSum, ReadPosRankSum]; 2D read tensor =
(reads=128, window=128, 15 channels). Output logits order:
[SNP, NOT_SNP, INDEL, NOT_INDEL] (scorevariants label order).
"""
from __future__ import annotations

import numpy as np

BEST_PRACTICES = ["MQ", "DP", "SOR", "FS", "QD", "MQRankSum", "ReadPosRankSum"]
WINDOW = 128
BN_EPS = 0.001


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def _extract_state_dict(obj):
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("state_dict", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    # strip common prefixes (Lightning wrappers save as model.xxx)
    out = {}
    for k, v in obj.items():
        out[k[6:] if k.startswith("model.") else k] = v
    return out


def load_torch_1d(path_or_state) -> dict:
    """GATK_CNN_1D state_dict -> JAX pytree (layer names per gatk_1d.py)."""
    if isinstance(path_or_state, (str, bytes)):
        import torch

        sd = torch.load(path_or_state, map_location="cpu", weights_only=False)
    else:
        sd = path_or_state
    sd = _extract_state_dict(sd)
    return {
        "conv0_w": _np(sd["conv.0.weight"]), "conv0_b": _np(sd["conv.0.bias"]),
        "conv2_w": _np(sd["conv.2.weight"]), "conv2_b": _np(sd["conv.2.bias"]),
        "conv5_w": _np(sd["conv.5.weight"]), "conv5_b": _np(sd["conv.5.bias"]),
        "bn_w": _np(sd["normalize.weight"]), "bn_b": _np(sd["normalize.bias"]),
        "bn_mean": _np(sd["normalize.running_mean"]),
        "bn_var": _np(sd["normalize.running_var"]),
        "d1_w": _np(sd["dense_1.0.weight"]), "d1_b": _np(sd["dense_1.0.bias"]),
        "d2_w": _np(sd["dense_2.0.weight"]), "d2_b": _np(sd["dense_2.0.bias"]),
        "d3_w": _np(sd["dense_3.weight"]), "d3_b": _np(sd["dense_3.bias"]),
    }


def forward_1d(params, reference, annotations):
    """Eval-mode forward of GATK_CNN_1D.

    reference: (B, 128, 4) one-hot float; annotations: (B, 7)."""
    import jax.numpy as jnp
    from jax import lax

    x = jnp.transpose(jnp.asarray(reference, jnp.float32), (0, 2, 1))  # (B,4,L)

    def conv(x, w, b):
        y = lax.conv_general_dilated(
            x, jnp.asarray(w), (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        return y + jnp.asarray(b)[None, :, None]

    x = jnp.maximum(conv(x, params["conv0_w"], params["conv0_b"]), 0.0)
    x = jnp.maximum(conv(x, params["conv2_w"], params["conv2_b"]), 0.0)
    x = jnp.maximum(conv(x, params["conv5_w"], params["conv5_b"]), 0.0)
    conv_flat = jnp.transpose(x, (0, 2, 1)).reshape(x.shape[0], -1)  # (B, L'*128)

    ann = jnp.asarray(annotations, jnp.float32)
    norm = (ann - params["bn_mean"]) / jnp.sqrt(params["bn_var"] + BN_EPS)
    norm = norm * params["bn_w"] + params["bn_b"]
    d1 = jnp.maximum(norm @ jnp.asarray(params["d1_w"]).T + params["d1_b"], 0.0)
    cat1 = jnp.concatenate([conv_flat, d1], axis=-1)
    d2 = jnp.maximum(cat1 @ jnp.asarray(params["d2_w"]).T + params["d2_b"], 0.0)
    cat2 = jnp.concatenate([d2, norm], axis=-1)
    return cat2 @ jnp.asarray(params["d3_w"]).T + params["d3_b"]


def load_torch_2d(path_or_state) -> dict:
    """GATK_CNN_2D state_dict -> JAX pytree (layer names per gatk_2d.py)."""
    if isinstance(path_or_state, (str, bytes)):
        import torch

        sd = torch.load(path_or_state, map_location="cpu", weights_only=False)
    else:
        sd = path_or_state
    sd = _extract_state_dict(sd)
    return {
        "conv0_w": _np(sd["conv.0.weight"]), "conv0_b": _np(sd["conv.0.bias"]),
        "conv3_w": _np(sd["conv.3.weight"]), "conv3_b": _np(sd["conv.3.bias"]),
        "conv6_w": _np(sd["conv.6.weight"]), "conv6_b": _np(sd["conv.6.bias"]),
        "conv10_w": _np(sd["conv.10.weight"]), "conv10_b": _np(sd["conv.10.bias"]),
        "bn_w": _np(sd["dense_1.0.weight"]), "bn_b": _np(sd["dense_1.0.bias"]),
        "bn_mean": _np(sd["dense_1.0.running_mean"]),
        "bn_var": _np(sd["dense_1.0.running_var"]),
        "d1_w": _np(sd["dense_1.1.weight"]), "d1_b": _np(sd["dense_1.1.bias"]),
        "d2_w": _np(sd["dense_2.0.weight"]), "d2_b": _np(sd["dense_2.0.bias"]),
        "d3_w": _np(sd["dense_2.3.weight"]), "d3_b": _np(sd["dense_2.3.bias"]),
    }


def forward_2d(params, read_tensor, annotations):
    """Eval-mode forward of GATK_CNN_2D.

    read_tensor: (B, reads=128, window=128, 15); annotations: (B, 7)."""
    import jax.numpy as jnp
    from jax import lax

    x = jnp.transpose(jnp.asarray(read_tensor, jnp.float32), (0, 3, 1, 2))  # NCHW

    def conv(x, w, b):
        y = lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + jnp.asarray(b)[None, :, None, None]

    def pool31(x):
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 1), (1, 1, 3, 1),
                                 "VALID")

    x = jnp.maximum(conv(x, params["conv0_w"], params["conv0_b"]), 0.0)
    x = jnp.maximum(conv(x, params["conv3_w"], params["conv3_b"]), 0.0)
    x = jnp.maximum(conv(x, params["conv6_w"], params["conv6_b"]), 0.0)
    x = pool31(x)
    x = jnp.maximum(conv(x, params["conv10_w"], params["conv10_b"]), 0.0)
    x = pool31(x)
    conv_flat = jnp.transpose(x, (0, 2, 3, 1)).reshape(x.shape[0], -1)

    ann = jnp.asarray(annotations, jnp.float32)
    norm = (ann - params["bn_mean"]) / jnp.sqrt(params["bn_var"] + BN_EPS)
    norm = norm * params["bn_w"] + params["bn_b"]
    d1 = jnp.maximum(norm @ jnp.asarray(params["d1_w"]).T + params["d1_b"], 0.0)
    cat1 = jnp.concatenate([conv_flat, d1], axis=-1)
    d2 = jnp.maximum(cat1 @ jnp.asarray(params["d2_w"]).T + params["d2_b"], 0.0)
    return d2 @ jnp.asarray(params["d3_w"]).T + params["d3_b"]


def encode_reference_window(ref_bases: str) -> np.ndarray:
    """(128, 4) one-hot per encoders.py BASE_MAP (non-ACGT rows all-zero)."""
    out = np.zeros((WINDOW, 4), np.float32)
    for i, b in enumerate(ref_bases[:WINDOW]):
        j = {"A": 0, "C": 1, "G": 2, "T": 3}.get(b.upper())
        if j is not None:
            out[i, j] = 1.0
    return out


def encode_best_practices(info: dict) -> np.ndarray:
    out = np.zeros(len(BEST_PRACTICES), np.float32)
    for i, key in enumerate(BEST_PRACTICES):
        try:
            out[i] = float(str(info.get(key, 0.0)))
        except (TypeError, ValueError):
            out[i] = 0.0
    return out
