"""Second imported-weights parity anchor (beyond Generic_UNet): reference
swin attention/blocks (torch) vs csof `models.swin` with IMPORTED weights.

Covers BOTH reference implementations:
- `WindowAttention` (ref: nnunet/lib/swin_transformer.py:182) — the plain
  qkv-Linear + relative-position-bias-table module;
- `SwinTransformerBlock` + `WindowAttentionConvRpe`
  (ref: nnunet/lib/swin_transformer_2.py:314,41) — what the MTL model's
  swin bottleneck actually instantiates, at its shipped config
  (proj='linear', rpe_mode='bias', ref: seg_model.yaml:52,103), for both
  W-MSA and shifted SW-MSA.

Identical weights must give near-identical outputs — this validates the
architecture reconstruction at the transformer level the way
test_reference_unet_parity.py does at the conv level.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# stub the missing timm dependency of the reference's swin modules
if "timm.models.layers" not in sys.modules:
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tml = types.ModuleType("timm.models.layers")

    class _DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()
            self.p = p

        def forward(self, x):
            return x

    tml.DropPath = _DropPath
    tml.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    tml.trunc_normal_ = lambda t, mean=0.0, std=1.0, a=-2.0, b=2.0: torch.nn.init.trunc_normal_(
        t, mean, std, a * std, b * std
    )
    sys.modules.update({"timm": timm, "timm.models": tm, "timm.models.layers": tml})

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/nnunet/lib")

import jax
import jax.numpy as jnp

from csof_tpu.compat.torch_import import (
    import_swin_block_weights,
    import_window_attention_weights,
)
from csof_tpu.models.swin import SwinBlock, WindowAttention, window_partition

DIM, HEADS, WIN, H, W = 16, 4, 4, 8, 8


def _np_sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _rel_index_torch(win):
    coords = torch.stack(torch.meshgrid([torch.arange(win), torch.arange(win)]))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += win - 1
    rel[:, :, 1] += win - 1
    rel[:, :, 0] *= 2 * win - 1
    return rel.sum(-1)


def test_window_attention_parity():
    from nnunet.lib.swin_transformer import WindowAttention as RefWA

    torch.manual_seed(0)
    ref = RefWA(DIM, (WIN, WIN), HEADS).eval()
    # give the zero-init bias table real values
    with torch.no_grad():
        ref.relative_position_bias_table.normal_(0, 0.5)

    x_np = np.random.RandomState(1).rand(4, WIN * WIN, DIM).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x_np))

    mine = WindowAttention(DIM, HEADS, WIN)
    params = mine.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    params = import_window_attention_weights(_np_sd(ref), params)
    out = mine.apply(params, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-5, rtol=1e-4)


def test_window_attention_parity_with_mask():
    from nnunet.lib.swin_transformer import WindowAttention as RefWA

    torch.manual_seed(2)
    ref = RefWA(DIM, (WIN, WIN), HEADS).eval()
    with torch.no_grad():
        ref.relative_position_bias_table.normal_(0, 0.5)

    nw = (H // WIN) * (W // WIN)
    rng = np.random.RandomState(3)
    x_np = rng.rand(nw, WIN * WIN, DIM).astype(np.float32)
    # the reference's -100-valued block mask convention
    mask_np = np.where(rng.rand(nw, WIN * WIN, WIN * WIN) > 0.5, 0.0, -100.0).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x_np), mask=torch.from_numpy(mask_np))

    mine = WindowAttention(DIM, HEADS, WIN)
    params = mine.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    params = import_window_attention_weights(_np_sd(ref), params)
    out = mine.apply(params, jnp.asarray(x_np), jnp.asarray(mask_np))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shift", [0, WIN // 2])
def test_mtl_swin_block_parity(shift):
    """The MTL bottleneck's actual block: SwinTransformerBlock with
    WindowAttentionConvRpe at proj='linear', rpe_mode='bias'."""
    from nnunet.lib.swin_transformer_2 import SwinTransformerBlock as RefBlock

    torch.manual_seed(4 + shift)
    ref = RefBlock(
        norm=torch.nn.BatchNorm2d,  # unused with proj='linear'
        dim=DIM,
        attention_map=False,
        input_resolution=(H, W),
        proj="linear",
        use_conv_mlp=False,
        num_heads=HEADS,
        device="cpu",
        relative_position_index=_rel_index_torch(WIN),
        rpe_mode="bias",
        rpe_contextual_tensor=None,
        window_size=WIN,
        shift_size=shift,
    ).eval()
    with torch.no_grad():
        ref.attn.rpe_table.normal_(0, 0.5)

    x_np = np.random.RandomState(5).rand(H, W, DIM).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np.reshape(1, H * W, DIM)))
    ref_out = ref_out.numpy().reshape(H, W, DIM)

    mine = SwinBlock(DIM, HEADS, WIN, shift=shift)
    params = mine.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    params = import_swin_block_weights(_np_sd(ref), params)
    out = mine.apply(params, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5, rtol=1e-4)
