"""Streaming dataset with native asynchronous double-buffered prefetch.

`ImageDataset` (dataset.py) holds every decoded sample in host memory —
fine at the reference's 500-image scale, but a full LPFF/FFHQ-scale corpus
does not fit.  This module streams instead: one pass materializes raw
float32 caches next to the images ({name}_rgb{S}.bin in addition to the
reference's {name}_dinov2.bin/{name}_depth.bin cache contract, reference:
scripts/training/train_gaussian_decoder.py:525-681), then every training
batch is assembled by the native C++ prefetch executor
(fresnel_tpu/native/fresnel_native.cpp) on background threads while the
jitted step consumes the previous batch — the TPU-native, in-process
equivalent of the reference's DataLoader(num_workers=4) worker processes
(reference: train_gaussian_decoder.py:1738-1767).

Falls back to synchronous numpy loads when the native library is absent;
the yielded batch dicts are identical either way (and identical to
ImageDataset.batches()).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

from fresnel_tpu.data.dataset import (
    IMG_EXTS, _load_image, cache_paths, color_jitter)


class StreamingImageDataset:
    """Disk-streamed batches, double-buffered through the native prefetcher.

    Interface-compatible with ImageDataset (``__len__`` / ``batches``).
    """

    def __init__(self, data_dir: str, image_size: int = 256,
                 feature_size: int = 37, feature_dim: int = 384,
                 use_augmentation: bool = True,
                 max_images: Optional[int] = None,
                 prefetch: bool = True):
        self.data_dir = Path(data_dir)
        self.image_size = image_size
        self.feature_size = feature_size
        self.feature_dim = feature_dim
        self.use_augmentation = use_augmentation
        self.prefetch = prefetch

        paths = sorted(p for p in self.data_dir.glob("*")
                       if p.suffix.lower() in IMG_EXTS)
        if max_images is not None:
            paths = paths[:max_images]
        if not paths:
            raise FileNotFoundError(f"no images in {data_dir}")
        self._image_files: List[Path] = paths
        self._extractor = None
        self._depth_estimator = None
        self._ensure_caches()

    # -- cache materialization ------------------------------------------

    def _get_extractor(self):
        if self._extractor is None:
            from fresnel_tpu.models.encoders import create_feature_extractor
            self._extractor = create_feature_extractor(
                grid=self.feature_size, dim=self.feature_dim)
        return self._extractor

    def _cache_paths(self, img_path: Path):
        return cache_paths(img_path, self.image_size, self.feature_dim)[:3]

    def _ensure_caches(self):
        """Create (or re-create) caches; validates byte sizes.

        Size validation is load-bearing: the native prefetcher reads FIXED
        float counts per region, so a cache written at a different
        resolution (ImageDataset tolerates any square depth map) would be
        silently truncated into garbage.  Wrong-size caches are recomputed
        at this dataset's shapes."""
        S, g, c = self.image_size, self.feature_size, self.feature_dim
        expect = {0: S * S * 3 * 4, 1: g * g * c * 4, 2: 256 * 256 * 4}

        def ok(path, kind):
            return path.exists() and path.stat().st_size == expect[kind]

        for p in self._image_files:
            rgb_path, feat_path, depth_path = self._cache_paths(p)
            need_rgb = not ok(rgb_path, 0)
            need_feat = not ok(feat_path, 1)
            need_depth = not ok(depth_path, 2)
            if not (need_rgb or need_feat or need_depth):
                continue
            for path, needed in ((rgb_path, need_rgb), (feat_path, need_feat),
                                 (depth_path, need_depth)):
                # A cache that EXISTS at the wrong byte size was written by
                # someone else (e.g. an external depth estimator at another
                # resolution); warn before replacing it rather than
                # clobbering silently.
                if needed and path.exists():
                    import sys
                    print(f"warning: cache {path} has unexpected size "
                          f"{path.stat().st_size} B — recomputing at this "
                          f"dataset's shapes (old file overwritten)",
                          file=sys.stderr)
            img = _load_image(p, self.image_size)
            if need_rgb:
                img.astype(np.float32).tofile(rgb_path)
            if need_feat:
                feats = np.asarray(self._get_extractor()(img))
                feats.astype(np.float32).tofile(feat_path)
            if need_depth:
                from fresnel_tpu.models.encoders import create_depth_estimator
                if self._depth_estimator is None:
                    self._depth_estimator = create_depth_estimator("auto")
                depth = np.asarray(self._depth_estimator(img, 256))
                depth.astype(np.float32).tofile(depth_path)

    # -- batch streaming ------------------------------------------------

    def __len__(self) -> int:
        return len(self._image_files)

    def _submit(self, idx: np.ndarray):
        """Start one batch's native load; returns (job, layout) or None."""
        from fresnel_tpu import native

        S, g, c = self.image_size, self.feature_size, self.feature_dim
        img_f, feat_f, depth_f = S * S * 3, g * g * c, 256 * 256
        B = len(idx)
        paths, sizes, offsets = [], [], []
        off = 0
        for region_floats, kind in ((img_f, 0), (feat_f, 1), (depth_f, 2)):
            for j in idx:
                paths.append(str(self._cache_paths(self._image_files[j])[kind]))
                sizes.append(region_floats)
                offsets.append(off)
                off += region_floats
        job = native.prefetch_submit(paths, sizes, offsets, off)
        return None if job is None else (job, (B, img_f, feat_f, depth_f, idx))

    def _vlm_batch(self, idx) -> Optional[np.ndarray]:
        """(B, 1, gh, gw) VLM density maps, or None unless EVERY sample has
        one (the ImageDataset.batches contract)."""
        maps = []
        for j in idx:
            vp = cache_paths(self._image_files[j], self.image_size,
                             self.feature_dim)[3]
            if not vp.exists():
                return None
            maps.append(np.load(vp))
        return np.stack(maps)[:, None]

    def _assemble(self, job_layout, rng) -> Dict[str, np.ndarray]:
        job, (B, img_f, feat_f, depth_f, idx) = job_layout
        try:
            buf = job.wait()
            if buf is None:
                raise IOError(
                    f"native prefetch failed (file index {job.error_index()})")
            S, g, c = self.image_size, self.feature_size, self.feature_dim
            imgs = buf[:B * img_f].reshape(B, S, S, 3)
            feats = buf[B * img_f:B * (img_f + feat_f)].reshape(B, g, g, c)
            depths = buf[B * (img_f + feat_f):].reshape(B, 256, 256)
            if self.use_augmentation:
                imgs = np.stack([color_jitter(rng, im) for im in imgs])
            else:
                imgs = np.array(imgs)  # own the memory before job is freed
            batch = {
                "image": np.transpose(imgs, (0, 3, 1, 2)),
                "features": np.array(feats),
                "depth": np.array(depths),
            }
            vlm = self._vlm_batch(idx)
            if vlm is not None:
                batch["vlm_density"] = vlm
            return batch
        finally:
            # Free the native buffer deterministically even on the error
            # path — repeated failures must not pile up batch-sized mallocs
            # until GC runs __del__.
            job.close()

    def _load_sync(self, idx: np.ndarray, rng) -> Dict[str, np.ndarray]:
        S, g, c = self.image_size, self.feature_size, self.feature_dim
        imgs, feats, depths = [], [], []
        for j in idx:
            rgb_p, feat_p, depth_p = self._cache_paths(self._image_files[j])
            img = np.fromfile(rgb_p, np.float32).reshape(S, S, 3)
            if self.use_augmentation:
                img = color_jitter(rng, img)
            imgs.append(np.transpose(img, (2, 0, 1)))
            feats.append(np.fromfile(feat_p, np.float32).reshape(g, g, c))
            depths.append(np.fromfile(depth_p, np.float32).reshape(256, 256))
        batch = {"image": np.stack(imgs), "features": np.stack(feats),
                 "depth": np.stack(depths)}
        vlm = self._vlm_batch(idx)
        if vlm is not None:
            batch["vlm_density"] = vlm
        return batch

    def batches(self, batch_size: int, rng: np.random.Generator,
                shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self._image_files))
        if shuffle:
            rng.shuffle(order)
        starts = list(range(0, len(order) - batch_size + 1, batch_size))
        if not starts:
            return

        from fresnel_tpu import native
        use_native = self.prefetch and native.is_available()

        if not use_native:
            for i in starts:
                yield self._load_sync(order[i:i + batch_size], rng)
            return

        # Double buffer: submit batch k+1 before blocking on batch k, so
        # disk IO for the next batch overlaps the device step on this one.
        pending = self._submit(order[starts[0]:starts[0] + batch_size])
        if pending is None:  # native refused (e.g. mid-run unload)
            for i in starts:
                yield self._load_sync(order[i:i + batch_size], rng)
            return
        for k in range(len(starts)):
            nxt = None
            if k + 1 < len(starts):
                j = starts[k + 1]
                nxt = self._submit(order[j:j + batch_size])
            batch = self._assemble(pending, rng)
            if nxt is None and k + 1 < len(starts):
                # Native became unavailable mid-epoch; finish synchronously.
                yield batch
                for i2 in starts[k + 1:]:
                    yield self._load_sync(order[i2:i2 + batch_size], rng)
                return
            pending = nxt
            yield batch
