"""Ingest reference PyTorch checkpoints into the flax parameter tree.

Maps the state_dict of the reference ``CoPoNeRF`` module (models/CoPoNeRF.py,
incl. torchvision resnet34 key names, backbone.py:52-57) onto this
framework's parameter structure, converting layouts:
  Linear (out,in) -> kernel (in,out); Conv2d (O,I,kh,kw) -> (kh,kw,I,O);
  BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats;
  LayerNorm/GroupNorm weight -> scale.

Unused reference parameters (corr_embed CoPoNeRF.py:73, latent_avg_* :89-93,
cross_attn.qkv backbone.py:294) are skipped, mirroring the reference's own
strict=False load (train.py:116).

Usage:
    state = load_torch_checkpoint("model.pth")          # numpy state_dict
    params, batch_stats = convert_state_dict(state)
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

SKIP_PATTERNS = [
    r"^corr_embed\.",
    r"^latent_avg_",
    r"\.cross_attn\.qkv\.",
    r"num_batches_tracked$",
    r"^encoder\.model\.fc\.",
    r"^encoder\.model\.avgpool\.",
]

RESNET_LAYER_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    return {k: v.detach().numpy() for k, v in sd.items()}


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    # torch (O, I, 1, 1) or Conv1d (O, I, 1) -> dense (I, O)
    return np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T)


def _map_resnet(key: str):
    """encoder.model.* -> encoder/* in our tree. Returns (path, kind)."""
    k = key[len("encoder.model."):]
    m = re.match(r"conv1\.(weight)$", k)
    if m:
        return "encoder/stem/conv/kernel", "conv"
    m = re.match(r"bn1\.(\w+)$", k)
    if m:
        return f"encoder/stem/bn/{m.group(1)}", "bn"
    m = re.match(r"layer(\d)\.(\d+)\.(conv1|conv2|bn1|bn2)\.(\w+)$", k)
    if m:
        stage, block, sub, leaf = int(m.group(1)), m.group(2), m.group(3), m.group(4)
        cb = "cb1" if sub in ("conv1", "bn1") else "cb2"
        mod = "conv" if sub.startswith("conv") else "bn"
        name = "kernel" if (mod == "conv" and leaf == "weight") else leaf
        return f"encoder/layer{stage}_{block}/{cb}/{mod}/{name}", mod
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.(0|1)\.(\w+)$", k)
    if m:
        stage, block, idx, leaf = int(m.group(1)), m.group(2), m.group(3), m.group(4)
        if idx == "0":
            return f"encoder/layer{stage}_{block}/downsample/conv/kernel", "conv"
        return f"encoder/layer{stage}_{block}/downsample/bn/{leaf}", "bn"
    raise KeyError(f"unmapped resnet key: {key}")


def _map_encoder4d(prefix_t: str, rest: str, prefix_f: str):
    """conv4d.I.0.{query,supp}_conv.{weight,bias} / conv4d.I.1.{weight,bias}."""
    m = re.match(r"conv4d\.(\d+)\.0\.(query_conv|supp_conv)\.(weight|bias)$", rest)
    if m:
        i, conv, leaf = m.groups()
        name = "kernel" if leaf == "weight" else "bias"
        return f"{prefix_f}/conv4d_{i}/{conv}/{name}", ("conv" if leaf == "weight" else "raw")
    m = re.match(r"conv4d\.(\d+)\.1\.(weight|bias)$", rest)
    if m:
        i, leaf = m.groups()
        name = "scale" if leaf == "weight" else "bias"
        return f"{prefix_f}/gn_{i}/{name}", "raw"
    raise KeyError(f"unmapped Encoder4D key: {prefix_t}.{rest}")


def _map_token_mlp(rest: str, prefix_f: str):
    """Sequential(Linear, DWConv, GELU, Linear): 0 -> fc1, 1.dwconv, 3 -> fc2."""
    m = re.match(r"0\.(weight|bias)$", rest)
    if m:
        return f"{prefix_f}/fc1/Dense_0/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "linear" if m.group(1) == "weight" else "raw"
        )
    m = re.match(r"1\.dwconv\.(weight|bias)$", rest)
    if m:
        return f"{prefix_f}/dwconv/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "conv" if m.group(1) == "weight" else "raw"
        )
    m = re.match(r"3\.(weight|bias)$", rest)
    if m:
        return f"{prefix_f}/fc2/Dense_0/{'kernel' if m.group(1)=='weight' else 'bias'}", (
            "linear" if m.group(1) == "weight" else "raw"
        )
    raise KeyError(rest)


def _map_layernorm(rest: str, prefix_f: str):
    leaf = rest.split(".")[-1]
    return f"{prefix_f}/{'scale' if leaf == 'weight' else 'bias'}", "raw"


def _map_ufclayer(rest: str, prefix_f: str):
    for lin in ("q_proj", "k_proj", "v_proj", "v_cross"):
        m = re.match(rf"{lin}\.(weight|bias)$", rest)
        if m:
            return f"{prefix_f}/{lin}/Dense_0/{'kernel' if m.group(1)=='weight' else 'bias'}", (
                "linear" if m.group(1) == "weight" else "raw"
            )
    for enc in ("v_proj_corr", "mlp_corr", "mlp_refine_corr", "mlp_refine_corr2", "feat_to_corr1", "feat_to_corr2"):
        if rest.startswith(enc + "."):
            return _map_encoder4d(enc, rest[len(enc) + 1:], f"{prefix_f}/{enc}")
    for mlp in ("mlp", "mlp_cross"):
        if rest.startswith(mlp + "."):
            return _map_token_mlp(rest[len(mlp) + 1:], f"{prefix_f}/{mlp}")
    for ln in ("norm1", "norm2", "norm_cross1", "norm_cross2"):
        if rest.startswith(ln + "."):
            return _map_layernorm(rest, f"{prefix_f}/{ln}")
    if rest == "pos_embed":
        return f"{prefix_f}/pos_embed", "raw"
    raise KeyError(f"unmapped UFCLayer key: {rest}")


def _map_mlpseq(rest: str, prefix_f: str, torch_indices):
    """nn.Sequential of Linears at given indices -> fc0/fc1/fc2."""
    m = re.match(r"(\d+)\.(weight|bias)$", rest)
    if not m:
        raise KeyError(rest)
    idx = torch_indices.index(int(m.group(1)))
    return f"{prefix_f}/fc{idx}/Dense_0/{'kernel' if m.group(2)=='weight' else 'bias'}", (
        "linear" if m.group(2) == "weight" else "raw"
    )


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) nested dicts of numpy arrays."""
    params: dict = {}
    batch_stats: dict = {}

    for key, val in sd.items():
        if any(re.search(p, key) for p in SKIP_PATTERNS):
            continue

        path = kind = None
        if key.startswith("encoder.model."):
            path, kind = _map_resnet(key)
        elif key.startswith("conv_map."):
            leaf = key.split(".")[-1]
            path = f"conv_map/{'kernel' if leaf=='weight' else 'bias'}"
            kind = "conv" if leaf == "weight" else "raw"
        elif key.startswith("feature_cost_aggregation."):
            rest = key[len("feature_cost_aggregation."):]
            m = re.match(r"proj_feat\.(\d)\.0\.(weight|bias)$", rest)
            if m:
                i, leaf = m.groups()
                path = f"feature_cost_aggregation/proj_feat_{i}/Dense_0/{'kernel' if leaf=='weight' else 'bias'}"
                kind = "linear" if leaf == "weight" else "raw"
            elif rest.startswith("embedding."):
                i = rest.split(".")[1]
                path, kind = _map_encoder4d(
                    f"embedding.{i}", rest[len(f"embedding.{i}."):],
                    f"feature_cost_aggregation/embedding_{i}",
                )
            elif rest.startswith("layers."):
                parts = rest.split(".")
                s, i = parts[1], parts[2]
                path, kind = _map_ufclayer(
                    ".".join(parts[3:]), f"feature_cost_aggregation/layers_{s}_{i}"
                )
            else:
                raise KeyError(f"unmapped UFC key: {key}")
        elif key.startswith("cross_attention."):
            rest = key[len("cross_attention."):]
            if rest.startswith("cross_attn.proj_fundamental."):
                leaf = rest.split(".")[-1]
                path = f"cross_attention/cross_attn/proj_fundamental/Dense_0/{'kernel' if leaf=='weight' else 'bias'}"
                kind = "linear" if leaf == "weight" else "raw"
            elif rest.startswith("mlp."):
                m = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)$", rest)
                path = f"cross_attention/mlp/{m.group(1)}/Dense_0/{'kernel' if m.group(2)=='weight' else 'bias'}"
                kind = "linear" if m.group(2) == "weight" else "raw"
            elif rest.split(".")[0] in ("norm1", "norm2", "norm"):
                path, kind = _map_layernorm(rest, f"cross_attention/{rest.split('.')[0]}")
            else:
                raise KeyError(f"unmapped cross_attention key: {key}")
        elif key.startswith("pose_regressor."):
            path, kind = _map_mlpseq(key[len("pose_regressor."):], "pose_regressor", [0, 2, 4])
        elif key.startswith("rotation_regressor."):
            path, kind = _map_mlpseq(key[len("rotation_regressor."):], "rotation_regressor", [1, 3, 5])
        elif key.startswith("translation_regressor."):
            path, kind = _map_mlpseq(key[len("translation_regressor."):], "translation_regressor", [1, 3, 5])
        elif key.startswith("phi."):
            rest = key[len("phi."):]
            m = re.match(r"(lin_in|lin_out)\.(weight|bias)$", rest)
            if m:
                path = f"phi/{m.group(1)}/Dense_0/{'kernel' if m.group(2)=='weight' else 'bias'}"
                kind = "linear" if m.group(2) == "weight" else "raw"
            m = re.match(r"lin_z\.(\d)\.(weight|bias)$", rest)
            if m:
                path = f"phi/lin_z_{m.group(1)}/Dense_0/{'kernel' if m.group(2)=='weight' else 'bias'}"
                kind = "linear" if m.group(2) == "weight" else "raw"
            m = re.match(r"blocks\.(\d)\.(fc_0|fc_1)\.(weight|bias)$", rest)
            if m:
                path = f"phi/block_{m.group(1)}/{m.group(2)}/Dense_0/{'kernel' if m.group(3)=='weight' else 'bias'}"
                kind = "linear" if m.group(3) == "weight" else "raw"
            if path is None:
                raise KeyError(f"unmapped phi key: {key}")
        else:
            # 1x1 conv heads (query_encode_latent, latent_value, key_map, ...)
            m = re.match(r"^(\w+)\.(weight|bias)$", key)
            if not m:
                raise KeyError(f"unmapped key: {key}")
            mod, leaf = m.groups()
            path = f"{mod}/Dense_0/{'kernel' if leaf=='weight' else 'bias'}"
            kind = "conv1x1" if leaf == "weight" else "raw"

        if kind == "linear":
            val = _linear(val)
        elif kind == "conv":
            val = _conv(val)
        elif kind == "conv1x1":
            val = _conv1x1_to_dense(val)
        elif kind == "bn":
            leaf = path.split("/")[-1]
            if leaf == "weight":
                path = path[: -len("weight")] + "scale"
            if leaf in ("running_mean", "running_var"):
                path = path.replace("running_mean", "mean").replace("running_var", "var")
                _set(batch_stats, path, val)
                continue
            path = path.replace("/weight", "/scale")
        val = np.asarray(val)
        _set(params, path, val)

    return params, batch_stats
