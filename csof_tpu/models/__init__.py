"""Model zoo (flax.linen, channels-last NHWC/NDHWC layouts for TPU)."""

from csof_tpu.models.unet import GenericUNet, unet_from_plans
from csof_tpu.models.raft import RAFT
from csof_tpu.models.voxelmorph import VoxelMorph
from csof_tpu.models.segflow import SegFlow
from csof_tpu.models.finalflow import FinalFlow, FinalFlowConfig
from csof_tpu.models.mtl import MTLConfig, MTLModel, ModelWrap
from csof_tpu.models.discriminator import PatchDiscriminator
from csof_tpu.models.vqvae import VQVAE
from csof_tpu.models.diffusion import DDPM, DenoiserUNet, DiffusionConfig

__all__ = [
    "GenericUNet",
    "unet_from_plans",
    "RAFT",
    "VoxelMorph",
    "SegFlow",
    "FinalFlow",
    "FinalFlowConfig",
    "MTLModel",
    "MTLConfig",
    "ModelWrap",
    "PatchDiscriminator",
    "VQVAE",
    "DDPM",
    "DenoiserUNet",
    "DiffusionConfig",
]
