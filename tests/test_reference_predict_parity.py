"""END-TO-END inference parity: our sliding-window predictor vs the
reference's predict_3D, both driving the SAME weights.

The reference's full inference engine (torch/CPU:
nnunet/network_architecture/neural_network.py predict_3D:77 ->
_internal_predict_3D_3Dconv_tiled:292 / _internal_predict_3D_2Dconv_tiled)
runs here in-image against a Generic_UNet; its weights are imported into our
flax GenericUNet and pushed through csof_tpu's SlidingWindowPredictor
(batched tiles x mirrors, fused gather->forward->scatter-add). Softmax maps
must agree to atol 1e-4 — this is the strongest accuracy evidence available
without the real datasets (VERDICT r1 item 5a).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# stub the reference's batchgenerators dependency with OUR pad (same math,
# adapted to the batchgenerators argument order the reference calls with:
# pad_nd_image(image, new_shape, mode, kwargs, return_slicer, divisible_by))
from csof_tpu.ops.padcrop import pad_nd_image as _pad


def _bg_pad_nd_image(image, new_shape=None, mode="constant", kwargs=None,
                     return_slicer=False, shape_must_be_divisible_by=None):
    cv = (kwargs or {}).get("constant_values", 0)
    out = _pad(image, new_shape, mode, cv, shape_must_be_divisible_by, return_slicer)
    if return_slicer:
        padded, slicer = out
        return padded, list(slicer)  # batchgenerators returns a LIST slicer
    return out


if "batchgenerators.augmentations.utils" not in sys.modules:
    bg = types.ModuleType("batchgenerators")
    bga = types.ModuleType("batchgenerators.augmentations")
    bgu = types.ModuleType("batchgenerators.augmentations.utils")
    bgu.pad_nd_image = _bg_pad_nd_image
    sys.modules["batchgenerators"] = bg
    sys.modules["batchgenerators.augmentations"] = bga
    sys.modules["batchgenerators.augmentations.utils"] = bgu
else:
    sys.modules["batchgenerators.augmentations.utils"].pad_nd_image = _bg_pad_nd_image

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from csof_tpu.compat.torch_import import import_generic_unet_weights
from csof_tpu.inference.predictor import PredictorConfig, SlidingWindowPredictor
from csof_tpu.models.unet import GenericUNet


def _make_pair(threed: bool, num_pool=2, base=4, num_classes=3):
    from torch import nn

    from nnunet.network_architecture.generic_UNet import Generic_UNet
    from nnunet.network_architecture.initialization import InitWeights_He

    if threed:
        pools = [[1, 2, 2], [2, 2, 2]]
        kernels = [[1, 3, 3], [3, 3, 3], [3, 3, 3]]
        conv_op, norm_op, drop_op = nn.Conv3d, nn.InstanceNorm3d, nn.Dropout3d
    else:
        pools = [[2, 2], [2, 2]]
        kernels = [[3, 3]] * (num_pool + 1)
        conv_op, norm_op, drop_op = nn.Conv2d, nn.InstanceNorm2d, nn.Dropout2d

    ref = Generic_UNet(
        input_channels=1, base_num_features=base, num_classes=num_classes,
        num_pool=num_pool, num_conv_per_stage=2,
        conv_op=conv_op, norm_op=norm_op,
        norm_op_kwargs={"eps": 1e-5, "affine": True},
        dropout_op=drop_op, dropout_op_kwargs={"p": 0, "inplace": True},
        nonlin=nn.LeakyReLU, nonlin_kwargs={"negative_slope": 1e-2, "inplace": True},
        deep_supervision=True, dropout_in_localization=False,
        final_nonlin=lambda x: x, weightInitializer=InitWeights_He(1e-2),
        pool_op_kernel_sizes=pools, conv_kernel_sizes=kernels,
        upscale_logits=False, convolutional_pooling=True,
        convolutional_upsampling=True,
    ).eval()
    ref.do_ds = False  # what the ref trainers set before predict_3D
    ref.inference_apply_nonlin = lambda x: torch.softmax(x, 1)

    if not threed:
        # The fork's neural_network.py 2D tiled path calls
        # _internal_maybe_mirror_and_pred_2D(x, axes, get_flops, binary,
        # do_mirroring, mult, normalize=...) (:718), but the BASE class
        # signature (:573) is (x, axes, do_mirroring, mult) — only the MTL
        # subclass (MTL_model.py:816) implements the extended one. Adapt so
        # the base Generic_UNet runs the same math (binary/normalize are
        # no-ops at their defaults, flops/time are reporting-only).
        base2d = ref._internal_maybe_mirror_and_pred_2D

        def _adapted(x, mirror_axes, get_flops=False, binary=False,
                     do_mirroring=True, mult=None, normalize=False):
            return base2d(x, mirror_axes, do_mirroring, mult), None, None

        ref._internal_maybe_mirror_and_pred_2D = _adapted

    mine = GenericUNet(
        num_classes=num_classes, base_num_features=base,
        pool_kernel_sizes=tuple(tuple(p) for p in pools),
        conv_kernel_sizes=tuple(tuple(k) for k in kernels),
        conv_per_stage=2, deep_supervision=True,
    )
    ndim = 3 if threed else 2
    x0 = jnp.zeros((1, *((8,) * ndim), 1))
    params = mine.init(jax.random.PRNGKey(0), x0)
    params = import_generic_unet_weights(ref.state_dict(), jax.device_get(params))

    def apply_fn(p, x):  # predictor wants the full-res head only
        return mine.apply(p, x)[0]

    return ref, apply_fn, params


@pytest.mark.parametrize("do_mirroring", [False, True])
def test_predict3d_3dconv_tiled_parity(do_mirroring):
    ref, apply_fn, params = _make_pair(threed=True)
    patch = (4, 16, 16)
    rng = np.random.RandomState(0)
    image = rng.randn(1, 6, 22, 26).astype(np.float32)

    ref_seg, ref_soft = ref.predict_3D(
        image, do_mirroring=do_mirroring, mirror_axes=(0, 1, 2),
        use_sliding_window=True, step_size=0.5, patch_size=patch,
        use_gaussian=True, pad_border_mode="constant",
        pad_kwargs={"constant_values": 0}, all_in_gpu=False,
        verbose=False, mixed_precision=False,
    )[:2]

    cfg = PredictorConfig(
        patch_size=patch, num_classes=3, step_size=0.5,
        do_mirroring=do_mirroring, use_gaussian=True, tile_batch=4, bucket=1,
    )
    pred = SlidingWindowPredictor(apply_fn, cfg)
    seg, soft = pred.predict(params, image)

    np.testing.assert_allclose(soft, ref_soft, atol=1e-4)
    np.testing.assert_array_equal(seg, ref_seg)


@pytest.mark.parametrize("do_mirroring", [False, True])
def test_predict3d_2dconv_tiled_parity(do_mirroring):
    """2D net over a 3D stack: ref loops slices; ours folds depth into one
    program — outputs must still match."""
    ref, apply_fn, params = _make_pair(threed=False)
    patch = (16, 16)
    rng = np.random.RandomState(1)
    image = rng.randn(1, 5, 22, 26).astype(np.float32)

    ref_seg, ref_soft = ref.predict_3D(
        image, do_mirroring=do_mirroring, mirror_axes=(0, 1),
        use_sliding_window=True, step_size=0.5, patch_size=patch,
        use_gaussian=True, pad_border_mode="constant",
        pad_kwargs={"constant_values": 0}, all_in_gpu=False,
        verbose=False, mixed_precision=False,
    )[:2]

    cfg = PredictorConfig(
        patch_size=patch, num_classes=3, step_size=0.5,
        do_mirroring=do_mirroring, use_gaussian=True, tile_batch=4, bucket=1,
        depth_bucket=1,
    )
    pred = SlidingWindowPredictor(apply_fn, cfg)
    seg, soft = pred.predict_2d_stack(params, image)

    np.testing.assert_allclose(soft, ref_soft, atol=1e-4)
    np.testing.assert_array_equal(seg, ref_seg)
