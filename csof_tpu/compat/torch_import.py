"""Import reference nnU-Net (torch) Generic_UNet weights into csof_tpu.

Lets users of the reference bring their trained checkpoints
(ref: model_{best,final_checkpoint}.model state dicts of
nnunet/network_architecture/generic_UNet.py Generic_UNet built with the
nnUNetTrainerV2 recipe) into the flax `GenericUNet` — and doubles as the
strongest parity check: identical weights must give identical outputs.

Layout mapping (torch -> flax):
- conv weight (out, in, kh, kw)           -> kernel (kh, kw, in, out)
- transp-conv weight (in, out, kh, kw)    -> kernel (kh, kw, in, out)
- InstanceNorm weight/bias                 -> scale/bias
- conv_blocks_context[d]                   -> StackedConvs_d
- conv_blocks_context[-1] (two stacked)    -> StackedConvs_{num_pool}
- tu[u] / conv_blocks_localization[u]      -> ConvTranspose_u / StackedConvs_{num_pool+1+u}
- seg_outputs[u] (deepest first)           -> seg_head_{level}
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _conv_w(t):
    # torch conv weight (out, in, *spatial) -> flax kernel (*spatial, in, out)
    t = np.asarray(t)
    nd = t.ndim - 2
    return np.transpose(t, (*range(2, 2 + nd), 1, 0))


def _tconv_w(t):
    # torch ConvTranspose weight: (in, out, *spatial); lax.conv_transpose
    # with transpose_kernel=False consumes (*spatial, in, out) with spatial
    # axes mirrored relative to torch's scatter convention
    t = np.asarray(t)
    nd = t.ndim - 2
    w = np.transpose(t, (*range(2, 2 + nd), 0, 1))
    return w[(slice(None, None, -1),) * nd]


def import_generic_unet_weights(
    state_dict: Mapping[str, "object"], params: dict
) -> dict:
    """state_dict: reference torch state dict (cpu tensors/ndarrays);
    params: init output of csof GenericUNet (to be overwritten in place
    structure-preservingly). Returns new params dict."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p = params["params"] if "params" in params else params
    out = _deep_copy(p)

    num_pool = sum(1 for k in sd if _is_ctx_first_conv(k)) - 1

    # encoder + bottleneck
    for d in range(num_pool + 1):
        mine = out[f"StackedConvs_{d}"]
        if d < num_pool:
            srcs = [
                (f"conv_blocks_context.{d}.blocks.{i}.conv", f"conv_blocks_context.{d}.blocks.{i}.instnorm")
                for i in range(_n_blocks(sd, f"conv_blocks_context.{d}.blocks"))
            ]
        else:
            # bottleneck: Sequential of two StackedConvLayers
            srcs = []
            for sub in (0, 1):
                base = f"conv_blocks_context.{d}.{sub}.blocks"
                for i in range(_n_blocks(sd, base)):
                    srcs.append((f"{base}.{i}.conv", f"{base}.{i}.instnorm"))
        _fill_stacked(mine, srcs, sd)

    # decoder
    u = 0
    while f"tu.{u}.weight" in sd:
        tk = out[f"ConvTranspose_{u}"]
        tk["kernel"] = _tconv_w(sd[f"tu.{u}.weight"]).astype(tk["kernel"].dtype)
        if "bias" in tk and f"tu.{u}.bias" in sd:
            tk["bias"] = np.asarray(sd[f"tu.{u}.bias"]).astype(tk["bias"].dtype)
        mine = out[f"StackedConvs_{num_pool + 1 + u}"]
        srcs = []
        for sub in (0, 1):
            base = f"conv_blocks_localization.{u}.{sub}.blocks"
            for i in range(_n_blocks(sd, base)):
                srcs.append((f"{base}.{i}.conv", f"{base}.{i}.instnorm"))
        _fill_stacked(mine, srcs, sd)
        # seg head: ref seg_outputs[u] is the DEEPEST first; decoder iter u
        # emits level = num_pool - 1 - u -> head name seg_head_{level}
        level = num_pool - 1 - u
        head = out[f"seg_head_{level}"]
        head["kernel"] = _conv_w(sd[f"seg_outputs.{u}.weight"]).astype(head["kernel"].dtype)
        u += 1

    return {"params": out} if "params" in params else out


def _is_ctx_first_conv(key: str) -> bool:
    import re

    return re.fullmatch(r"conv_blocks_context\.\d+(\.0)?\.blocks\.0\.conv\.weight", key) is not None


def _n_blocks(sd, base: str) -> int:
    n = 0
    while f"{base}.{n}.conv.weight" in sd:
        n += 1
    return n


def _fill_stacked(mine: dict, srcs, sd):
    for i, (conv_key, norm_key) in enumerate(srcs):
        blk = mine[f"ConvNormAct_{i}"]
        conv = blk["Conv_0"]
        conv["kernel"] = _conv_w(sd[f"{conv_key}.weight"]).astype(conv["kernel"].dtype)
        conv["bias"] = np.asarray(sd[f"{conv_key}.bias"]).astype(conv["bias"].dtype)
        norm = blk["InstanceNorm_0"]
        norm["scale"] = np.asarray(sd[f"{norm_key}.weight"]).astype(norm["scale"].dtype)
        norm["bias"] = np.asarray(sd[f"{norm_key}.bias"]).astype(norm["bias"].dtype)


def _deep_copy(tree):
    if isinstance(tree, Mapping):
        return {k: _deep_copy(v) for k, v in tree.items()}
    return np.asarray(tree).copy()


def load_reference_checkpoint(model_file: str, params: dict) -> dict:
    """Load a reference `model_*.model` torch checkpoint file and import its
    network weights (ref checkpoint layout: dict with 'state_dict',
    ref: network_trainer.py:305-335; DataParallel 'module.' prefixes
    stripped as in ref: load_checkpoint_ram:418)."""
    import torch

    ckpt = torch.load(model_file, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = { (k[len("module."):] if k.startswith("module.") else k): v for k, v in sd.items() }
    return import_generic_unet_weights(sd, params)


def _lin_w(t):
    # torch Linear weight (out, in) -> flax Dense kernel (in, out)
    return np.asarray(t).T


def import_window_attention_weights(state_dict: Mapping[str, "object"], params: dict) -> dict:
    """Import a reference `WindowAttention` module's weights
    (ref: nnunet/lib/swin_transformer.py:182 — qkv/proj Linears + the
    (2w-1)^2 x num_heads relative-position-bias table) into csof
    `models.swin.WindowAttention` params. Also accepts the
    `WindowAttentionConvRpe` variant that the MTL model's swin bottleneck
    actually instantiates (ref: nnunet/lib/swin_transformer_2.py:41 with
    proj='linear', rpe_mode='bias' per seg_model.yaml:52,103) whose
    `rpe_table` is the SAME table stored transposed (num_heads, size).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p = params["params"] if "params" in params else params
    out = _deep_copy(p)
    out["Dense_0"]["kernel"] = _lin_w(sd["qkv.weight"]).astype(out["Dense_0"]["kernel"].dtype)
    out["Dense_0"]["bias"] = sd["qkv.bias"].astype(out["Dense_0"]["bias"].dtype)
    out["Dense_1"]["kernel"] = _lin_w(sd["proj.weight"]).astype(out["Dense_1"]["kernel"].dtype)
    out["Dense_1"]["bias"] = sd["proj.bias"].astype(out["Dense_1"]["bias"].dtype)
    if "relative_position_bias_table" in sd:  # swin_transformer.py layout (size, nh)
        table = sd["relative_position_bias_table"]
    else:  # swin_transformer_2 WindowAttentionConvRpe rpe_table (nh, size)
        table = sd["rpe_table"].T
    out["rel_pos_bias"] = table.astype(out["rel_pos_bias"].dtype)
    return {"params": out} if "params" in params else out


def import_swin_block_weights(state_dict: Mapping[str, "object"], params: dict) -> dict:
    """Import a reference `SwinTransformerBlock`'s weights
    (ref: nnunet/lib/swin_transformer_2.py:314 — norm1/attn/norm2/mlp with
    the WindowAttentionConvRpe attention, proj='linear', rpe_mode='bias',
    plain fc1/fc2 Mlp) into csof `models.swin.SwinBlock` params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p = params["params"] if "params" in params else params
    out = _deep_copy(p)

    def _ln(dst, src):
        out[dst]["scale"] = sd[f"{src}.weight"].astype(out[dst]["scale"].dtype)
        out[dst]["bias"] = sd[f"{src}.bias"].astype(out[dst]["bias"].dtype)

    _ln("LayerNorm_0", "norm1")
    _ln("LayerNorm_1", "norm2")
    attn_sd = {k[len("attn."):]: v for k, v in sd.items() if k.startswith("attn.")}
    out["WindowAttention_0"] = import_window_attention_weights(attn_sd, out["WindowAttention_0"])
    for dst, src in (("Dense_0", "mlp.fc1"), ("Dense_1", "mlp.fc2")):
        out[dst]["kernel"] = _lin_w(sd[f"{src}.weight"]).astype(out[dst]["kernel"].dtype)
        out[dst]["bias"] = sd[f"{src}.bias"].astype(out[dst]["bias"].dtype)
    return {"params": out} if "params" in params else out
