"""Model zoo (flax.linen, channels-last NHWC/NDHWC layouts for TPU)."""

from csof_tpu.models.unet import GenericUNet, unet_from_plans

__all__ = ["GenericUNet", "unet_from_plans"]
