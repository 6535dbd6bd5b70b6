"""Visualization: flow color wheels, seg overlays, strain curves, TensorBoard.

Capability parity with the reference's `Visualizer`
(ref: nnunet/visualization/visualization.py:35-765 — seg overlays, flow
quiver/RGB via flow_to_image, registered sequences, strain curves,
similarity maps, all logged to TensorBoard per epoch).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def flow_to_image(flow: np.ndarray, max_norm: float | None = None) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 color wheel (Middlebury convention,
    the visualization behind torchvision's flow_to_image used by the
    reference's Visualizer)."""
    fy, fx = flow[..., 0], flow[..., 1]
    mag = np.sqrt(fx**2 + fy**2)
    ang = np.arctan2(fy, fx)  # [-pi, pi]
    if max_norm is None:
        max_norm = max(float(mag.max()), 1e-6)
    hue = (ang + np.pi) / (2 * np.pi)  # [0, 1]
    sat = np.clip(mag / max_norm, 0, 1)
    val = np.ones_like(hue)
    # hsv -> rgb
    i = np.floor(hue * 6).astype(int) % 6
    f = hue * 6 - np.floor(hue * 6)
    p = val * (1 - sat)
    q = val * (1 - f * sat)
    t = val * (1 - (1 - f) * sat)
    rgb = np.zeros((*hue.shape, 3))
    for k, (r, g, b) in enumerate([(val, t, p), (q, val, p), (p, val, t), (p, q, val), (t, p, val), (val, p, q)]):
        m = i == k
        rgb[m, 0], rgb[m, 1], rgb[m, 2] = r[m], g[m], b[m]
    return (rgb * 255).astype(np.uint8)


_SEG_COLORS = np.array(
    [[0, 0, 0], [230, 60, 60], [60, 180, 75], [60, 100, 230], [255, 225, 25],
     [145, 30, 180], [70, 240, 240]], np.float32,
)


def seg_overlay(image: np.ndarray, seg: np.ndarray, alpha: float = 0.45) -> np.ndarray:
    """(H, W) image in [0,1] + (H, W) int labels -> (H, W, 3) uint8 overlay
    (ref: Visualizer.log_images seg panels)."""
    img = np.clip(image, 0, 1)[..., None] * 255
    rgb = np.repeat(img, 3, axis=-1)
    colors = _SEG_COLORS[np.clip(seg, 0, len(_SEG_COLORS) - 1)]
    mask = (seg > 0)[..., None]
    out = np.where(mask, (1 - alpha) * rgb + alpha * colors, rgb)
    return out.astype(np.uint8)


def attention_heatmap(
    image: np.ndarray, attn: np.ndarray, alpha: float = 0.55, cmap: str = "plasma"
) -> np.ndarray:
    """(H, W) image in [0,1] + (h, w) attention/similarity map (any scale) ->
    (H, W, 3) uint8 colormapped overlay. The low-res map is bilinearly
    resized to the image and min-max normalized, matching the reference's
    attention logging (ref: visualization.py:1035-1050 log_attn_map_images:
    cv.resize + colormap + add_images)."""
    from scipy.ndimage import zoom

    attn = np.asarray(attn, np.float32)
    if attn.shape != image.shape:
        factors = (image.shape[0] / attn.shape[0], image.shape[1] / attn.shape[1])
        attn = zoom(attn, factors, order=1)
    lo, hi = float(attn.min()), float(attn.max())
    attn = (attn - lo) / (hi - lo + 1e-8)
    import matplotlib

    matplotlib.use("Agg")

    heat = matplotlib.colormaps[cmap](attn)[..., :3] * 255.0
    img = np.repeat(np.clip(image, 0, 1)[..., None] * 255.0, 3, axis=-1)
    return ((1 - alpha) * img + alpha * heat).astype(np.uint8)


def strain_curve_figure(strain: dict, out_path: str | Path | None = None):
    """Plot rv/lv strain curves (ref: Visualizer.log_strain)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for name, curve in strain.items():
        ax.plot(np.asarray(curve), label=name)
    ax.set_xlabel("frame")
    ax.set_ylabel("strain [%]")
    ax.legend()
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
        return Path(out_path)
    return fig


class TensorBoardVisualizer:
    """Per-epoch scalar/image logging (ref: Visualizer + SummaryWriter at
    ref: SegFlowGaussian.py(trainer):245,761-807). Uses tensorboardX."""

    def __init__(self, log_dir: str | Path):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(str(log_dir))

    def log_scalars(self, tag_values: dict[str, float], step: int):
        for tag, v in tag_values.items():
            self.writer.add_scalar(tag, float(v), step)

    def log_seg(self, tag: str, image: np.ndarray, seg: np.ndarray, step: int):
        self.writer.add_image(tag, seg_overlay(image, seg), step, dataformats="HWC")

    def log_flow(self, tag: str, flow: np.ndarray, step: int):
        self.writer.add_image(tag, flow_to_image(flow), step, dataformats="HWC")

    def log_video(self, tag: str, frames: np.ndarray, step: int, fps: int = 4):
        """frames: (T, H, W) in [0, 1]."""
        vid = (np.clip(frames, 0, 1) * 255).astype(np.uint8)[None, :, None]
        self.writer.add_video(tag, vid, step, fps=fps)

    def log_attention(self, tag: str, image: np.ndarray, attn: np.ndarray, step: int):
        """Colormapped attention-weights overlay
        (ref: visualization.py:1035 log_attn_map_images). `attn` may be any
        resolution; it is resized to `image`."""
        self.writer.add_image(tag, attention_heatmap(image, attn), step, dataformats="HWC")

    def log_similarity(
        self, tag: str, image: np.ndarray, sims: dict[str, np.ndarray], step: int
    ):
        """Per-scale similarity maps (e.g. the SegFlow correlation volumes'
        per-pixel max, sown as intermediates `sim_<lvl>`), each overlaid on
        the input frame (ref: visualization.py:370 log_sim_images)."""
        self.writer.add_image(
            f"{tag}/input",
            (np.clip(image, 0, 1) * 255).astype(np.uint8)[..., None],
            step, dataformats="HWC",
        )
        for name, sim in sims.items():
            self.writer.add_image(
                f"{tag}/{name}", attention_heatmap(image, sim), step, dataformats="HWC"
            )

    def log_segflow_intermediates(
        self, tag: str, video: np.ndarray, intermediates: dict, step: int, frame: int = -1
    ):
        """Log one frame's sown SegFlow maps: the two bottleneck attention
        maps + per-scale correlation similarities. `intermediates` is the
        mutable collection returned by
        `model.apply(..., mutable=['intermediates'])[1]['intermediates']`."""
        flat = {}

        def walk(node, prefix):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, prefix + [k])
                else:
                    flat["/".join(prefix + [k])] = v

        walk(intermediates, [])
        img = np.asarray(video[frame, ..., 0] if video.ndim == 4 else video[frame])
        for path, val in flat.items():
            arr = np.asarray(val[0] if isinstance(val, (tuple, list)) else val)
            if arr.ndim == 3:  # (T, h, w) stacked over the scan
                arr = arr[frame]
            key = path.split("/")[-2] if path.endswith("attn_weights") else path.split("/")[-1]
            self.writer.add_image(
                f"{tag}/{key}", attention_heatmap(img, arr), step, dataformats="HWC"
            )

    def close(self):
        self.writer.close()
