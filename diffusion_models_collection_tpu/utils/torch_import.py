"""Import reference PyTorch checkpoints into this framework.

Migration path for users of the reference (sunyzhi55/Diffusion_Models_
Collection): its `train.py` writes `torch.save` dicts with keys
{epoch, model_state_dict, optimizer_state_dict, best_loss, config,
[scheduler_state_dict], [ema_model_state_dict]} (reference
utils/trainer.py:328-365). `load_reference_checkpoint` converts such a
file into this framework's checkpoint payload — the flax param pytrees
drop into `sample.py` / `evaluate.py` unchanged, so

    python sample.py --checkpoint path/to/best_model.pth

"just works" on a reference-trained model (utils/checkpoint.py routes
.pth/.pt files here). Optimizer/scheduler state is NOT converted (torch
Adam moments don't map onto optax pytrees 1:1) — importing resumes
sampling/evaluation, not mid-run optimization.

Weight-layout conversions (torch -> flax):
  Linear  (out, in)        -> kernel (in, out)          [transpose]
  Conv2d  (O, I, kh, kw)   -> kernel (kh, kw, I, O)     [NHWC layout]
  Conv1d depthwise (D,1,k) -> kernel (k, 1, D)
  GroupNorm/LayerNorm weight -> scale
  Embedding weight          -> embedding

Structure maps are exact per backbone (verified by cross-framework
numerical parity tests in tests/test_torch_import.py, which run the
actual reference modules under torch-CPU):
  UNet: reference models/unet.py:123-241 — module registration order
        equals our flax call-order auto-numbering, so blocks are matched
        by ordered type counters (ResidualBlock/AttentionBlock/Down/Up).
  DiT:  reference models/dit.py:154-261 — nn.MultiheadAttention's fused
        in_proj maps onto SelfAttention's qkv Dense (same [q;k;v] packing
        and contiguous head split).
  DiM:  reference models/dim.py:208-345 — both mamba_ssm.Mamba weights
        (in_proj split into our in_proj_x/in_proj_z halves) and the
        no-mamba attention fallback are handled.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _t_lin(w) -> np.ndarray:
    return np.asarray(w).T


def _t_conv2d(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _t_conv1d_dw(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 1, 0)


def _arr(w) -> np.ndarray:
    return np.asarray(w)


def _set(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.ascontiguousarray(value, dtype=np.float32)


def _strip_module_prefix(sd: Dict) -> Dict:
    """DDP-wrapped reference models save under 'module.' (trainer.py:58-61
    with .module unwrap at save; strip defensively for hand-saved dicts)."""
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _to_numpy_state_dict(sd: Dict) -> Dict:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# --------------------------------------------------------------------- UNet
def _convert_unet(sd: Dict) -> Dict:
    params: Dict = {}
    _set(params, "UNetTimeEmbed_0/Dense_0/kernel", _t_lin(sd["time_embed.1.weight"]))
    _set(params, "UNetTimeEmbed_0/Dense_0/bias", _arr(sd["time_embed.1.bias"]))
    _set(params, "UNetTimeEmbed_0/Dense_1/kernel", _t_lin(sd["time_embed.3.weight"]))
    _set(params, "UNetTimeEmbed_0/Dense_1/bias", _arr(sd["time_embed.3.bias"]))
    if "label_embed.weight" in sd:
        _set(params, "LabelEmbedder_0/embedding", _arr(sd["label_embed.weight"]))
    _set(params, "Conv_0/kernel", _t_conv2d(sd["input_conv.weight"]))
    _set(params, "Conv_0/bias", _arr(sd["input_conv.bias"]))
    _set(params, "FusedGroupNormSiLU_0/scale", _arr(sd["output.0.weight"]))
    _set(params, "FusedGroupNormSiLU_0/bias", _arr(sd["output.0.bias"]))
    _set(params, "Conv_1/kernel", _t_conv2d(sd["output.2.weight"]))
    _set(params, "Conv_1/bias", _arr(sd["output.2.bias"]))

    # Ordered block prefixes. torch registers down_blocks -> middle_block ->
    # up_blocks in construction order == our call order, so insertion order
    # of the state dict gives the global block sequence directly.
    prefixes = []
    for key in sd:
        m = re.match(r"(down_blocks\.\d+\.\d+|middle_block\.\d+|up_blocks\.\d+\.\d+)\.", key)
        if m and m.group(1) not in prefixes:
            prefixes.append(m.group(1))

    res_i = attn_i = down_i = up_i = 0
    for pref in prefixes:
        sub = {k[len(pref) + 1:]: v for k, v in sd.items() if k.startswith(pref + ".")}
        if "conv1.0.weight" in sub:  # ResidualBlock (unet.py:28-72)
            ours = f"ResidualBlock_{res_i}"
            res_i += 1
            _set(params, f"{ours}/FusedGroupNormSiLU_0/scale", _arr(sub["conv1.0.weight"]))
            _set(params, f"{ours}/FusedGroupNormSiLU_0/bias", _arr(sub["conv1.0.bias"]))
            _set(params, f"{ours}/Conv_0/kernel", _t_conv2d(sub["conv1.2.weight"]))
            _set(params, f"{ours}/Conv_0/bias", _arr(sub["conv1.2.bias"]))
            _set(params, f"{ours}/Dense_0/kernel", _t_lin(sub["time_mlp.1.weight"]))
            _set(params, f"{ours}/Dense_0/bias", _arr(sub["time_mlp.1.bias"]))
            if "label_proj.1.weight" in sub:
                _set(params, f"{ours}/Dense_1/kernel", _t_lin(sub["label_proj.1.weight"]))
            _set(params, f"{ours}/FusedGroupNormSiLU_1/scale", _arr(sub["conv2.0.weight"]))
            _set(params, f"{ours}/FusedGroupNormSiLU_1/bias", _arr(sub["conv2.0.bias"]))
            _set(params, f"{ours}/Conv_1/kernel", _t_conv2d(sub["conv2.3.weight"]))
            _set(params, f"{ours}/Conv_1/bias", _arr(sub["conv2.3.bias"]))
            if "shortcut.weight" in sub:
                _set(params, f"{ours}/Conv_2/kernel", _t_conv2d(sub["shortcut.weight"]))
                _set(params, f"{ours}/Conv_2/bias", _arr(sub["shortcut.bias"]))
        elif "qkv.weight" in sub:  # AttentionBlock (unet.py:75-99)
            ours = f"AttentionBlock_{attn_i}"
            attn_i += 1
            _set(params, f"{ours}/GroupNorm_0/scale", _arr(sub["norm.weight"]))
            _set(params, f"{ours}/GroupNorm_0/bias", _arr(sub["norm.bias"]))
            _set(params, f"{ours}/Conv_0/kernel", _t_conv2d(sub["qkv.weight"]))
            _set(params, f"{ours}/Conv_0/bias", _arr(sub["qkv.bias"]))
            _set(params, f"{ours}/Conv_1/kernel", _t_conv2d(sub["proj.weight"]))
            _set(params, f"{ours}/Conv_1/bias", _arr(sub["proj.bias"]))
        elif "conv.weight" in sub:  # Down/Upsample (unet.py:102-120)
            if pref.startswith("down_blocks"):
                ours = f"Downsample_{down_i}"
                down_i += 1
            else:
                ours = f"Upsample_{up_i}"
                up_i += 1
            _set(params, f"{ours}/Conv_0/kernel", _t_conv2d(sub["conv.weight"]))
            _set(params, f"{ours}/Conv_0/bias", _arr(sub["conv.bias"]))
        else:
            raise ValueError(f"Unrecognized UNet block at '{pref}': {sorted(sub)}")
    return params


# ------------------------------------------------------- DiT/DiM scaffolding
def _convert_patch_scaffold(sd: Dict, params: Dict):
    """pos_embed + patchify + timestep/label embedders, shared by DiT and
    DiM (reference dit.py:12-84 == dim.py:20-91)."""
    _set(params, "pos_embed", _arr(sd["pos_embed"]))
    _set(params, "PatchEmbed_0/Conv_0/kernel", _t_conv2d(sd["x_embedder.proj.weight"]))
    _set(params, "PatchEmbed_0/Conv_0/bias", _arr(sd["x_embedder.proj.bias"]))
    _set(params, "TimestepEmbedder_0/Dense_0/kernel", _t_lin(sd["t_embedder.mlp.0.weight"]))
    _set(params, "TimestepEmbedder_0/Dense_0/bias", _arr(sd["t_embedder.mlp.0.bias"]))
    _set(params, "TimestepEmbedder_0/Dense_1/kernel", _t_lin(sd["t_embedder.mlp.2.weight"]))
    _set(params, "TimestepEmbedder_0/Dense_1/bias", _arr(sd["t_embedder.mlp.2.bias"]))
    if "y_embedder.embedding_table.weight" in sd:
        _set(params, "LabelEmbedder_0/embedding",
             _arr(sd["y_embedder.embedding_table.weight"]))


def _convert_dit(sd: Dict) -> Dict:
    params: Dict = {}
    _convert_patch_scaffold(sd, params)
    n_blocks = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        ref = f"blocks.{i}"
        ours = f"DiTBlock_{i}"
        _set(params, f"{ours}/SelfAttention_0/Dense_0/kernel",
             _t_lin(sd[f"{ref}.attn.in_proj_weight"]))
        _set(params, f"{ours}/SelfAttention_0/Dense_0/bias",
             _arr(sd[f"{ref}.attn.in_proj_bias"]))
        _set(params, f"{ours}/SelfAttention_0/Dense_1/kernel",
             _t_lin(sd[f"{ref}.attn.out_proj.weight"]))
        _set(params, f"{ours}/SelfAttention_0/Dense_1/bias",
             _arr(sd[f"{ref}.attn.out_proj.bias"]))
        _set(params, f"{ours}/Mlp_0/Dense_0/kernel", _t_lin(sd[f"{ref}.mlp.0.weight"]))
        _set(params, f"{ours}/Mlp_0/Dense_0/bias", _arr(sd[f"{ref}.mlp.0.bias"]))
        _set(params, f"{ours}/Mlp_0/Dense_1/kernel", _t_lin(sd[f"{ref}.mlp.3.weight"]))
        _set(params, f"{ours}/Mlp_0/Dense_1/bias", _arr(sd[f"{ref}.mlp.3.bias"]))
        _set(params, f"{ours}/AdaLNModulation_0/Dense_0/kernel",
             _t_lin(sd[f"{ref}.adaLN_modulation.1.weight"]))
        _set(params, f"{ours}/AdaLNModulation_0/Dense_0/bias",
             _arr(sd[f"{ref}.adaLN_modulation.1.bias"]))
    _set(params, "FinalLayer_0/Dense_0/kernel", _t_lin(sd["final_layer.linear.weight"]))
    _set(params, "FinalLayer_0/Dense_0/bias", _arr(sd["final_layer.linear.bias"]))
    _set(params, "FinalLayer_0/AdaLNModulation_0/Dense_0/kernel",
         _t_lin(sd["final_layer.adaLN_modulation.1.weight"]))
    _set(params, "FinalLayer_0/AdaLNModulation_0/Dense_0/bias",
         _arr(sd["final_layer.adaLN_modulation.1.bias"]))
    return params


def _convert_dim(sd: Dict) -> Dict:
    params: Dict = {}
    _convert_patch_scaffold(sd, params)
    n_blocks = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        ref = f"blocks.{i}"
        ours = f"DiMBlock_{i}"
        mb = f"{ours}/MambaBlock_0"
        _set(params, f"{mb}/LayerNorm_0/scale", _arr(sd[f"{ref}.mamba_block.norm.weight"]))
        _set(params, f"{mb}/LayerNorm_0/bias", _arr(sd[f"{ref}.mamba_block.norm.bias"]))
        _set(params, f"{mb}/AdaLNModulation_0/Dense_0/kernel",
             _t_lin(sd[f"{ref}.mamba_block.adaLN_modulation.1.weight"]))
        _set(params, f"{mb}/AdaLNModulation_0/Dense_0/bias",
             _arr(sd[f"{ref}.mamba_block.adaLN_modulation.1.bias"]))

        if f"{ref}.mamba_block.mamba.in_proj.weight" in sd:
            # Real mamba_ssm.Mamba weights (reference trained with CUDA
            # kernels). Its fused in_proj rows are [x; z] (d_inner each).
            mm = f"{ref}.mamba_block.mamba"
            in_proj = _arr(sd[f"{mm}.in_proj.weight"])  # (2*d_inner, d)
            d_inner = in_proj.shape[0] // 2
            _set(params, f"{mb}/Mamba_0/in_proj_x/kernel", _t_lin(in_proj[:d_inner]))
            _set(params, f"{mb}/Mamba_0/in_proj_z/kernel", _t_lin(in_proj[d_inner:]))
            _set(params, f"{mb}/Mamba_0/conv/kernel", _t_conv1d_dw(sd[f"{mm}.conv1d.weight"]))
            _set(params, f"{mb}/Mamba_0/conv/bias", _arr(sd[f"{mm}.conv1d.bias"]))
            _set(params, f"{mb}/Mamba_0/x_dbl/kernel", _t_lin(sd[f"{mm}.x_proj.weight"]))
            _set(params, f"{mb}/Mamba_0/dt_proj/kernel", _t_lin(sd[f"{mm}.dt_proj.weight"]))
            _set(params, f"{mb}/Mamba_0/dt_proj/bias", _arr(sd[f"{mm}.dt_proj.bias"]))
            _set(params, f"{mb}/Mamba_0/A_log", _arr(sd[f"{mm}.A_log"]))
            _set(params, f"{mb}/Mamba_0/D", _arr(sd[f"{mm}.D"]))
            _set(params, f"{mb}/Mamba_0/out_proj/kernel", _t_lin(sd[f"{mm}.out_proj.weight"]))
        elif f"{ref}.mamba_block.mamba.in_proj_weight" in sd:
            # Attention fallback (reference dim.py:111-117): a plain
            # nn.MultiheadAttention — maps onto our SelfAttention 'attn'.
            mm = f"{ref}.mamba_block.mamba"
            _set(params, f"{mb}/attn/Dense_0/kernel", _t_lin(sd[f"{mm}.in_proj_weight"]))
            _set(params, f"{mb}/attn/Dense_0/bias", _arr(sd[f"{mm}.in_proj_bias"]))
            _set(params, f"{mb}/attn/Dense_1/kernel", _t_lin(sd[f"{mm}.out_proj.weight"]))
            _set(params, f"{mb}/attn/Dense_1/bias", _arr(sd[f"{mm}.out_proj.bias"]))
        else:
            raise ValueError(f"No Mamba or attention weights under '{ref}.mamba_block'")

        ff = f"{ours}/FeedForward_0"
        _set(params, f"{ff}/LayerNorm_0/scale", _arr(sd[f"{ref}.ff_block.norm.weight"]))
        _set(params, f"{ff}/LayerNorm_0/bias", _arr(sd[f"{ref}.ff_block.norm.bias"]))
        _set(params, f"{ff}/Mlp_0/Dense_0/kernel", _t_lin(sd[f"{ref}.ff_block.mlp.0.weight"]))
        _set(params, f"{ff}/Mlp_0/Dense_0/bias", _arr(sd[f"{ref}.ff_block.mlp.0.bias"]))
        _set(params, f"{ff}/Mlp_0/Dense_1/kernel", _t_lin(sd[f"{ref}.ff_block.mlp.3.weight"]))
        _set(params, f"{ff}/Mlp_0/Dense_1/bias", _arr(sd[f"{ref}.ff_block.mlp.3.bias"]))
        _set(params, f"{ff}/AdaLNModulation_0/Dense_0/kernel",
             _t_lin(sd[f"{ref}.ff_block.adaLN_modulation.1.weight"]))
        _set(params, f"{ff}/AdaLNModulation_0/Dense_0/bias",
             _arr(sd[f"{ref}.ff_block.adaLN_modulation.1.bias"]))

    _set(params, "DiMFinalLayer_0/LayerNorm_0/scale", _arr(sd["final_layer.norm_final.weight"]))
    _set(params, "DiMFinalLayer_0/LayerNorm_0/bias", _arr(sd["final_layer.norm_final.bias"]))
    _set(params, "DiMFinalLayer_0/Dense_0/kernel", _t_lin(sd["final_layer.linear.weight"]))
    _set(params, "DiMFinalLayer_0/Dense_0/bias", _arr(sd["final_layer.linear.bias"]))
    _set(params, "DiMFinalLayer_0/AdaLNModulation_0/Dense_0/kernel",
         _t_lin(sd["final_layer.adaLN_modulation.1.weight"]))
    _set(params, "DiMFinalLayer_0/AdaLNModulation_0/Dense_0/bias",
         _arr(sd["final_layer.adaLN_modulation.1.bias"]))
    return params


_CONVERTERS = {"unet": _convert_unet, "dit": _convert_dit, "dim": _convert_dim}


def convert_torch_state_dict(state_dict: Dict, model_type: str) -> Dict:
    """Torch state dict (tensors or arrays) -> flax param pytree."""
    sd = _to_numpy_state_dict(_strip_module_prefix(state_dict))
    try:
        converter = _CONVERTERS[model_type.lower()]
    except KeyError:
        raise ValueError(f"Unknown model type: {model_type}") from None
    return converter(sd)


def load_reference_checkpoint(path) -> Dict:
    """Load a reference `torch.save` checkpoint as this framework's payload.

    Returns the same logical keys our `utils/checkpoint.py` produces, so
    CLIs and the trainer's `load_checkpoint` consume it unchanged
    (optimizer/scheduler state intentionally dropped — see module doc).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" not in raw:
        raise ValueError(
            f"{path} is not a reference trainer checkpoint "
            "(missing 'model_state_dict')"
        )
    config = raw.get("config", {})
    model_type = config.get("model_type", "unet")
    payload = {
        "epoch": raw.get("epoch", 0),
        "best_loss": float(raw.get("best_loss", float("inf"))),
        "config": config,
        "model_state_dict": convert_torch_state_dict(
            raw["model_state_dict"], model_type
        ),
    }
    if raw.get("ema_model_state_dict") is not None:
        payload["ema_model_state_dict"] = convert_torch_state_dict(
            raw["ema_model_state_dict"], model_type
        )
    return payload
