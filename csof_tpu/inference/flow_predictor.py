"""Full-cine seg+flow inference: ROI crop -> batched video forward -> uncrop.

Capability parity with the reference's flow inference path
(ref: nnunet/network_architecture/Final_flow.py:705-1404 `predict_3D_flow` /
`_internal_predict_2D_2Dconv_tiled_flow` and
nnunet/network_architecture/SegFlowGaussian.py:2837,3294): center-crop to
patch, heart-ROI crop via the Processor, intensity normalization, model over
the full T sequence, mirror-TTA averaging of the seg softmax with the flow
taken from the unmirrored pass (ref: Final_flow.py:844-929), Processor
uncrop back to full FOV; outputs the Flow/Registered/Segmentation triad
(ref: SegFlowGaussian.py(trainer) validate_flow_one_step_lib:896-1208).

TPU-first: the reference loops depth slices serially
(ref: Final_flow.py:1136); here ALL depth slices run as one vmapped batch,
and the 3 TTA variants are folded into the same batch.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from csof_tpu.inference.processor import Processor


class FlowPredictor:
    def __init__(
        self,
        apply_fn: Callable,  # (video (T, H, W, 1)) -> {"seg_logits", "cum_flow", "registered"}
        crop_size: int = 128,
        processor: Processor | None = None,
        do_mirroring: bool = True,
    ):
        self.apply_fn = apply_fn
        self.crop_size = crop_size
        self.processor = processor or Processor(crop_size=crop_size)
        self.do_mirroring = do_mirroring
        self._jitted = {}

    def _get_jitted(self, key):
        if key not in self._jitted:

            def run(videos):  # (D, T, cs, cs, 1)
                out = jax.vmap(self.apply_fn)(videos)
                probs = jax.nn.softmax(out["seg_logits"].astype(jnp.float32), -1)
                if self.do_mirroring:
                    # TTA over x/y flips: seg softmax averaged, flow unmirrored
                    for axes in ((2,), (3,), (2, 3)):
                        flipped = jnp.flip(videos, axes)
                        o = jax.vmap(self.apply_fn)(flipped)
                        p = jax.nn.softmax(o["seg_logits"].astype(jnp.float32), -1)
                        probs = probs + jnp.flip(p, axes)
                    probs = probs / 4.0
                return probs, out["cum_flow"], out["registered"]

            self._jitted[key] = jax.jit(run)
        return self._jitted[key]

    def _sequence_roi_mask(self, video: np.ndarray, max_planes: int = 32) -> np.ndarray:
        """Union heart mask over (frame, slice) planes sampled evenly across
        the whole sequence (all planes when there are ≤ max_planes; the cap
        bounds cropping-network forwards on long cines)."""
        t, d = video.shape[:2]
        planes = [(ti, zi) for ti in range(t) for zi in range(d)]
        if len(planes) > max_planes:
            sel = np.linspace(0, len(planes) - 1, max_planes).astype(int)
            planes = [planes[i] for i in sel]
        mask = np.zeros(video.shape[-2:], bool)
        for ti, zi in planes:
            mask |= np.asarray(self.processor.get_mask(video[ti, zi]), bool)
        return mask

    def predict_video(self, video: np.ndarray, roi_mask: np.ndarray | None = None) -> dict:
        """video: (T, D, H, W) full cine volume (already spacing-resampled).

        Returns {"softmax": (C, T, D, H, W), "seg": (T, D, H, W),
        "flow": (T, D, H, W, 2), "registered": (T, D, H, W)} in the input FOV.
        """
        t, d, h, w = video.shape
        cs = self.crop_size

        # one ROI window per volume, derived from masks across the WHOLE
        # sequence (union over frames x slices) so the window covers the
        # heart at every phase and depth — the reference computes its fixed
        # window from masks over the sequence, not a single plane
        # (ref: processor.py:38 get_fixed_info + :53 get_translation over
        # the full video). A frame-0/mid-slice window drifts off the heart
        # on apical/basal slices with strong motion.
        mask = roi_mask if roi_mask is not None else self._sequence_roi_mask(video)
        _, record = self.processor.crop(video[0, d // 2], mask=mask)

        # crop all (T, D) planes with the same window
        y0, x0 = record["y0"], record["x0"]
        pad_y, pad_x = max(cs - h, 0), max(cs - w, 0)
        padded = np.pad(video, ((0, 0), (0, 0), (0, pad_y), (0, pad_x)))
        cropped = padded[:, :, y0 : y0 + cs, x0 : x0 + cs]  # (T, D, cs, cs)

        # per-frame min-max normalization (ref video loaders)
        mn = cropped.min(axis=(-2, -1), keepdims=True)
        mx = cropped.max(axis=(-2, -1), keepdims=True)
        norm = (cropped - mn) / (mx - mn + 1e-8)

        videos = jnp.asarray(np.moveaxis(norm, 1, 0)[..., None], jnp.float32)  # (D, T, cs, cs, 1)
        probs, flow, registered = self._get_jitted((d, t, cs))(videos)
        probs = np.moveaxis(np.asarray(probs), 0, 1)  # (T, D, cs, cs, C)
        # the model emits channel-major flow (D, T, 2, cs, cs) and (D, T,
        # cs, cs) registered (models/segflow.py layout convention); convert
        # to the channels-last host API here, on numpy
        flow = np.moveaxis(np.moveaxis(np.asarray(flow), 2, -1), 0, 1)  # (T, D, cs, cs, 2)
        registered = np.moveaxis(np.asarray(registered), 0, 1)  # (T, D, cs, cs)

        # uncrop back to full FOV
        def uncrop(arr, fill=0.0):
            return self.processor.uncrop(arr, record, fill=fill)

        c = probs.shape[-1]
        softmax_full = np.zeros((c, t, d, h, w), np.float32)
        softmax_full[0] = 1.0  # background outside ROI
        for ci in range(c):
            softmax_full[ci] = uncrop(probs[..., ci], fill=1.0 if ci == 0 else 0.0)
        flow_full = np.stack([uncrop(flow[..., i]) for i in range(2)], axis=-1)
        registered_full = uncrop(registered)
        seg = softmax_full.argmax(0)
        return {
            "softmax": softmax_full,
            "seg": seg,
            "flow": flow_full,
            "registered": registered_full,
            "roi_record": record,
        }


def processor_from_seg_model(apply_fn, params, patch_size: tuple[int, int], crop_size: int = 128) -> Processor:
    """Build the heart-ROI Processor from a trained 2D seg network — the
    reference's pretrained 'cropping network'
    (ref: processor.py `discretize:140`, build via adversarial_acdc.yaml)."""

    jitted = jax.jit(lambda p, x: jnp.argmax(apply_fn(p, x), axis=-1))

    def cropping_network(image: np.ndarray) -> np.ndarray:
        h, w = image.shape
        ph, pw = patch_size
        pad_h, pad_w = max(ph - h, 0), max(pw - w, 0)
        x = np.pad(image, ((0, pad_h), (0, pad_w)))[None, :ph, :pw, None]
        x = (x - x.mean()) / (x.std() + 1e-8)
        seg = np.asarray(jitted(params, jnp.asarray(x, jnp.float32)))[0]
        out = np.zeros((h, w), seg.dtype)
        hh, ww = min(h, ph), min(w, pw)
        out[:hh, :ww] = seg[:hh, :ww]
        return out

    return Processor(crop_size=crop_size, cropping_network=cropping_network)


def predict_video_sliding(
    predictor: FlowPredictor, video: np.ndarray, window: int, overlap: int = 1
) -> dict:
    """Temporal sliding-window inference for cycles longer than HBM allows
    (ref `inference_mode: sliding_window/overlap`, nnunet/video.yaml;
    assertions at ref: SegFlowGaussian.py:139-141): process windows of
    `window` frames and chain cumulative flows across windows by composing
    each window's flow with the carry flow at its anchor frame.

    video: (T, D, H, W). Returns the same dict as predict_video.
    """
    from csof_tpu.ops.warp import compose_flows

    t = video.shape[0]
    assert window >= 2 and 1 <= overlap < window
    step = window - overlap
    seg_chunks: list[np.ndarray] = []
    soft_chunks: list[np.ndarray] = []
    flow_chunks: list[np.ndarray] = []
    reg_chunks: list[np.ndarray] = []
    carry_flow = None  # (D, H, W, 2) cumulative flow at the current anchor
    t0 = 0
    while t0 < t - 1 or not flow_chunks:
        t1 = min(t0 + window, t)
        chunk = video[t0:t1]
        if chunk.shape[0] < 2:
            break
        res = predictor.predict_video(chunk)
        start = 0 if t0 == 0 else overlap
        cum = res["flow"]  # (Tc, D, H, W, 2) flows to the chunk anchor t0
        if carry_flow is not None:
            # Register frame ti to the GLOBAL anchor: warp by the chunk flow
            # first (ti -> chunk anchor), then by the carry (chunk anchor ->
            # global anchor) — compose_flows(flow_ab=chunk, flow_bc=carry).
            # Composition is non-commutative for spatially varying fields.
            carry = jnp.asarray(carry_flow)  # (D, H, W, 2)
            cum = np.asarray(
                jax.vmap(lambda c: jax.vmap(compose_flows)(c, carry))(jnp.asarray(cum))
            )
        seg_chunks.append(res["seg"][start:])
        soft_chunks.append(res["softmax"][:, start:])
        flow_chunks.append(cum[start:])
        reg_chunks.append(res["registered"][start:])
        if t1 >= t:
            break
        carry_flow = cum[step]
        t0 += step
    return {
        "seg": np.concatenate(seg_chunks, axis=0)[:t],
        "softmax": np.concatenate(soft_chunks, axis=1)[:, :t],
        "flow": np.concatenate(flow_chunks, axis=0)[:t],
        "registered": np.concatenate(reg_chunks, axis=0)[:t],
    }


def predict_and_export_case(
    predictor: FlowPredictor,
    video: np.ndarray,
    properties: dict,
    out_root: str | Path,
    case_id: str,
) -> dict:
    """Write the reference's output triad for one case:
    Flow/<case>.npz, Registered/<case>.nii.gz, Segmentation/<case>.nii.gz
    (ref: SegFlowGaussian.py(trainer):959-971)."""
    from csof_tpu.utils.nifti import save_nifti

    out_root = Path(out_root)
    res = predictor.predict_video(video)
    (out_root / "Flow").mkdir(parents=True, exist_ok=True)
    (out_root / "Registered").mkdir(parents=True, exist_ok=True)
    (out_root / "Segmentation").mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_root / "Flow" / f"{case_id}.npz", flow=np.moveaxis(res["flow"], -1, 0))
    spacing = properties.get("spacing_after_resampling", (1.0, 1.0, 1.0))
    save_nifti(
        res["registered"], out_root / "Registered" / f"{case_id}.nii.gz",
        spacing_xyz=tuple(np.asarray(spacing)[::-1]),
    )
    save_nifti(
        res["seg"].astype(np.uint8), out_root / "Segmentation" / f"{case_id}.nii.gz",
        spacing_xyz=tuple(np.asarray(spacing)[::-1]),
    )
    return res
