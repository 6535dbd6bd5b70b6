"""Model-level parity: reference Generic_UNet (torch) vs csof GenericUNet
with IMPORTED weights — identical inputs must give near-identical logits.

This validates both the architecture reconstruction and the checkpoint
import path (csof_tpu/compat/torch_import.py).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# stub the missing batchgenerators dependency of the reference's
# neural_network.py before importing it
if "batchgenerators.augmentations.utils" not in sys.modules:
    bg = types.ModuleType("batchgenerators")
    bga = types.ModuleType("batchgenerators.augmentations")
    bgu = types.ModuleType("batchgenerators.augmentations.utils")
    from csof_tpu.ops.padcrop import pad_nd_image as _pad

    bgu.pad_nd_image = _pad
    sys.modules["batchgenerators"] = bg
    sys.modules["batchgenerators.augmentations"] = bga
    sys.modules["batchgenerators.augmentations.utils"] = bgu

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from csof_tpu.compat.torch_import import import_generic_unet_weights
from csof_tpu.models.unet import GenericUNet


@pytest.fixture(scope="module")
def pair():
    from torch import nn

    from nnunet.network_architecture.generic_UNet import Generic_UNet
    from nnunet.network_architecture.initialization import InitWeights_He

    num_pool = 2
    pools = [[2, 2], [2, 2]]
    kernels = [[3, 3]] * (num_pool + 1)
    ref = Generic_UNet(
        input_channels=1,
        base_num_features=4,
        num_classes=3,
        num_pool=num_pool,
        num_conv_per_stage=2,
        conv_op=nn.Conv2d,
        norm_op=nn.InstanceNorm2d,
        norm_op_kwargs={"eps": 1e-5, "affine": True},
        dropout_op=nn.Dropout2d,
        dropout_op_kwargs={"p": 0, "inplace": True},
        nonlin=nn.LeakyReLU,
        nonlin_kwargs={"negative_slope": 1e-2, "inplace": True},
        deep_supervision=True,
        dropout_in_localization=False,
        final_nonlin=lambda x: x,
        weightInitializer=InitWeights_He(1e-2),
        pool_op_kernel_sizes=pools,
        conv_kernel_sizes=kernels,
        upscale_logits=False,
        convolutional_pooling=True,
        convolutional_upsampling=True,
    ).eval()

    mine = GenericUNet(
        num_classes=3,
        base_num_features=4,
        pool_kernel_sizes=tuple(tuple(p) for p in pools),
        conv_kernel_sizes=tuple(tuple(k) for k in kernels),
        conv_per_stage=2,
        deep_supervision=True,
    )
    x0 = jnp.zeros((1, 16, 16, 1))
    params = mine.init(jax.random.PRNGKey(0), x0)
    params = import_generic_unet_weights(ref.state_dict(), jax.device_get(params))
    return ref, mine, params


def test_imported_weights_match_outputs(pair):
    ref, mine, params = pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))
    ours = mine.apply(params, jnp.asarray(np.moveaxis(x, 1, -1)))
    assert len(ref_outs) == len(ours)
    for i, (r, o) in enumerate(zip(ref_outs, ours)):
        r_np = np.moveaxis(r.numpy(), 1, -1)
        np.testing.assert_allclose(
            np.asarray(o), r_np, atol=2e-3,
            err_msg=f"deep-supervision head {i} mismatch",
        )


def test_imported_weights_match_argmax(pair):
    ref, mine, params = pair
    rng = np.random.RandomState(1)
    x = rng.randn(1, 1, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_seg = ref(torch.from_numpy(x))[0].argmax(1).numpy()
    ours = np.asarray(mine.apply(params, jnp.asarray(np.moveaxis(x, 1, -1)))[0]).argmax(-1)
    agree = (ours == ref_seg).mean()
    assert agree > 0.999, f"argmax agreement {agree}"


def test_gaussian_map_parity_with_reference():
    """Our tile-importance map matches ref `_get_gaussian` exactly
    (ref: neural_network.py:251-265)."""
    from nnunet.network_architecture.neural_network import SegmentationNetwork

    from csof_tpu.ops.sliding_window import gaussian_importance_map

    for patch in ((56, 40), (8, 24, 24)):
        ref_map = SegmentationNetwork._get_gaussian(patch)
        ours = gaussian_importance_map(patch)
        np.testing.assert_allclose(ours, ref_map, rtol=1e-6)


def test_sliding_steps_parity_with_reference():
    """Step grids identical to ref `_compute_steps_for_sliding_window`."""
    from nnunet.network_architecture.neural_network import SegmentationNetwork

    from csof_tpu.ops.sliding_window import compute_steps

    rng = np.random.RandomState(7)
    for _ in range(100):
        nd = rng.randint(1, 4)
        patch = [int(rng.randint(8, 128)) for _ in range(nd)]
        image = [int(p + rng.randint(0, 2 * p)) for p in patch]
        step = float(rng.uniform(0.1, 1.0))
        ref_steps = SegmentationNetwork._compute_steps_for_sliding_window(
            tuple(patch), tuple(image), step
        )
        assert compute_steps(patch, image, step) == ref_steps
