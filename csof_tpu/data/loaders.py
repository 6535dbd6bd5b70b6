"""Online data loaders: patch sampler with foreground oversampling + cardiac
video chunk sampler.

Capability parity with the reference's loader families:
- `DataLoader2D/3D` patch sampling with 33% foreground oversampling
  (ref: nnunet/training/dataloading/dataset_loading.py:243-470,
  oversample logic in `get_do_oversample`),
- the canonical video loader `DataLoaderPreprocessed`
  (ref: dataset_loading.py:6119-6530): patient -> depth slice -> ED-anchored
  rotation of the frame ring, ED->ES forward or ED->..wrap..->ES reversed
  chunk choice, `video_length-2` random interior frames + ED + ES endpoints,
  labeled mask at ED/ES only, inter-frame distance vector, min-max
  normalization (ref :6517).

Loaders yield channels-last numpy batches; a thread prefetcher overlaps host
assembly with device steps (replacing batchgenerators' MultiThreadedAugmenter
process pool, ref: nnunet/training/data_augmentation/).
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterator

import numpy as np

from csof_tpu.data.dataset import load_case


class SegPatchLoader:
    """Random patch batches from preprocessed cases.

    yields {"data": (B, *patch, C), "seg": (B, *patch) int32}.
    """

    def __init__(
        self,
        dataset: dict[str, dict],
        patch_size,
        batch_size: int,
        oversample_foreground_percent: float = 0.33,
        num_modalities: int = 1,
        seed: int = 0,
        twod: bool | None = None,
    ):
        self.dataset = dataset
        self.cases = sorted(dataset)
        self.patch_size = tuple(patch_size)
        self.batch_size = batch_size
        self.oversample = oversample_foreground_percent
        self.num_modalities = num_modalities
        self.rng = np.random.RandomState(seed)
        self.twod = len(self.patch_size) == 2 if twod is None else twod

    def _oversample_this(self, item_idx: int) -> bool:
        # item i oversamples fg iff i >= round(batch * (1 - p)) (ref semantics)
        return item_idx >= round(self.batch_size * (1 - self.oversample))

    def _sample_patch(self, data: np.ndarray, props: dict, oversample: bool):
        """data: (C+1, z, y, x) with seg last. Returns (patch_data, patch_seg)."""
        vol_shape = data.shape[1:]
        if self.twod:
            z = self.rng.randint(vol_shape[0])
            center = None
            voxel = self._draw_class_voxel(props) if oversample else None
            if voxel is not None:
                # ONE voxel drives both the slice choice and the in-plane
                # crop center (ref DataLoader2D: the selected foreground voxel
                # supplies the slice AND the center; drawing them separately
                # can yield an "oversampled" patch with no foreground in the
                # chosen slice).
                z = voxel[0]
                center = voxel[1:]
            plane = data[:, z]
            return self._crop_nd(plane, props, center=center)
        center = None
        voxel = self._draw_class_voxel(props) if oversample else None
        if voxel is not None:
            center = voxel[-len(self.patch_size):]
        return self._crop_nd(data, props, center=center)

    def _draw_class_voxel(self, props: dict):
        """Uniformly pick a present class, then one of its fg voxels
        (ref: dataset_loading.py DataLoader3D.generate_train_batch fg
        oversampling). Returns the full (z, y, x) voxel or None."""
        if not props.get("class_locations"):
            return None
        classes = [c for c, locs in props["class_locations"].items() if len(locs)]
        if not classes:
            return None
        c = classes[self.rng.randint(len(classes))]
        locs = props["class_locations"][c]
        return locs[self.rng.randint(len(locs))]

    def _crop_nd(self, arr: np.ndarray, props: dict, center=None):
        """arr: (C+1, *spatial_nd) where nd == len(patch_size)."""
        spatial = arr.shape[1:]
        nd = len(self.patch_size)
        if center is None:
            center = [
                self.rng.randint(0, max(1, s))
                for s in spatial
            ]
        # patch window centered on `center`, zero-padded past borders —
        # multithreaded C++ gather (csof_tpu.native), numpy fallback inside
        from csof_tpu.native import extract_patches_2d, extract_patches_3d

        extract = extract_patches_2d if nd == 2 else extract_patches_3d
        out = extract(
            np.ascontiguousarray(arr, np.float32),
            np.asarray([center], np.int64),
            self.patch_size,
        )[0]
        data_p, seg_p = out[: self.num_modalities], out[-1]
        seg_p = np.maximum(seg_p, 0)  # -1 nonzero-mask -> background
        return data_p, seg_p.astype(np.int32)

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        datas, segs = [], []
        for i in range(self.batch_size):
            case = self.cases[self.rng.randint(len(self.cases))]
            data, props = load_case(self.dataset[case])
            d, s = self._sample_patch(np.asarray(data), props, self._oversample_this(i))
            datas.append(np.moveaxis(d, 0, -1))
            segs.append(s)
        return {"data": np.stack(datas), "seg": np.stack(segs)}


def sample_video_chunk(
    num_frames: int, ed_idx: int, es_idx: int, video_length: int, rng: np.random.RandomState,
    start_es: bool = False,
):
    """ED/ES-anchored frame-index sampling
    (ref: dataset_loading.py:6419-6462). Returns (frame_indices, labeled_mask,
    distance) with frame_indices[0] mapping to ED and the last to ES."""
    possible = np.arange(num_frames)
    possible = np.concatenate([possible[possible >= ed_idx], possible[possible < ed_idx]])
    stop = int(np.argwhere(possible == es_idx)[0][0])
    chunk1 = possible[: stop + 1]
    chunk2 = np.concatenate([possible[:1], possible[stop:][::-1]])
    possible = chunk1 if rng.randint(2) == 0 else chunk2
    assert possible[0] == ed_idx and possible[-1] == es_idx
    if start_es:
        possible = np.flip(possible)
    interior = rng.choice(np.arange(len(possible)), size=max(video_length - 2, 0))
    mask = np.concatenate([[True], np.zeros_like(interior, bool), [True]])
    idx = np.concatenate([[0], interior, [len(possible) - 1]])
    order = np.argsort(idx)
    idx = idx[order]
    distance = np.concatenate([np.diff(idx) / len(possible), [0.0]])
    return possible[idx], mask[order], distance.astype(np.float32)


class VideoChunkLoader:
    """Cardiac cine video batches for the flow models.

    `videos` maps patient -> {"frames": (T, z, y, x) float array,
    "seg": (T, z, y, x) int array or None, "ed": int, "es": int}.

    yields {"video": (B, L, H, W, 1), "seg": (B, L, H, W) int32 (-1 where
    unlabeled), "labeled_mask": (B, L), "distance": (B, L)}.
    """

    def __init__(
        self,
        videos: dict[str, dict],
        video_length: int = 6,
        batch_size: int = 1,
        crop_size: int = 128,
        seed: int = 0,
        start_es: bool = False,
    ):
        self.videos = videos
        self.names = sorted(videos)
        self.video_length = video_length
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.start_es = start_es
        self.rng = np.random.RandomState(seed)

    def _center_crop(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[-2:]
        cs = self.crop_size
        out = np.zeros((*img.shape[:-2], cs, cs), img.dtype)
        sy, sx = max((h - cs) // 2, 0), max((w - cs) // 2, 0)
        dy, dx = max((cs - h) // 2, 0), max((cs - w) // 2, 0)
        hh, ww = min(h, cs), min(w, cs)
        out[..., dy : dy + hh, dx : dx + ww] = img[..., sy : sy + hh, sx : sx + ww]
        return out

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        vids, segs, masks, dists = [], [], [], []
        for _ in range(self.batch_size):
            name = self.names[self.rng.randint(len(self.names))]
            v = self.videos[name]
            frames = v["frames"]
            t, depth = frames.shape[0], frames.shape[1]
            d_idx = self.rng.randint(depth)
            f_idx, mask, dist = sample_video_chunk(
                t, v["ed"] % t, v["es"] % t, self.video_length, self.rng, self.start_es
            )
            clip = self._center_crop(frames[f_idx, d_idx].astype(np.float32))
            # min-max per frame (ref: dataset_loading.py:6517), C++ threaded
            from csof_tpu.native import minmax_normalize

            clip = np.ascontiguousarray(clip)
            minmax_normalize(clip)
            vids.append(clip[..., None])
            if v.get("seg") is not None:
                s = self._center_crop(v["seg"][f_idx, d_idx].astype(np.int32))
                s[~mask] = -1
            else:
                s = np.full((self.video_length, self.crop_size, self.crop_size), -1, np.int32)
                mask = np.zeros_like(mask)
            segs.append(s)
            masks.append(mask.astype(np.float32))
            dists.append(dist)
        return {
            "video": np.stack(vids),
            "seg": np.stack(segs),
            "labeled_mask": np.stack(masks),
            "distance": np.stack(dists),
        }


class Prefetcher:
    """Background-thread batch prefetch (host pipeline overlap)."""

    def __init__(self, loader, depth: int = 3):
        self.loader = loader
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._work, daemon=True)
        self.thread.start()

    def _work(self):
        it = iter(self.loader)
        while not self._stop.is_set():
            batch = next(it)
            # retry the put of the SAME batch — a full queue is the steady
            # state while the device is busy; regenerating on timeout would
            # burn the 1-core host and skew the RNG-driven batch stream
            while not self._stop.is_set():
                try:
                    self.q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        return self.q.get()

    def close(self):
        self._stop.set()
