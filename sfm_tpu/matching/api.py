"""ImageMatcher — the stage-1 public API, artifact-compatible with the
reference (utils/find_matches.py:10-364).

Capability parity: detect features over an image range (with optional
silhouette masks), match + verify every pair, persist per-pair artifacts
(correspondences/*_pts{1,2}.npy, fundamental/*_F.npz, matches/*_matches.npz),
write matching_results.csv, and render match-overlay visualizations. The
compute path is the batched TPU sweep instead of the reference's per-pair
OpenCV loop; the on-disk contract (stage separation, resumable artifacts —
SURVEY.md section 1) is preserved.
"""
from __future__ import annotations

import csv
import logging
import time
from pathlib import Path
from typing import Optional

import numpy as np

from sfm_tpu.config import SfMConfig
from sfm_tpu.io.images import load_image_gray, load_image_gray_u8, load_mask
from sfm_tpu.features import detect_and_describe, detect_and_describe_batch
from sfm_tpu.matching.sweep import all_pairs_sweep, PairTable

logger = logging.getLogger(__name__)

_IMG_EXTS = (".ppm", ".pgm", ".png", ".jpg", ".jpeg", ".pnm")


class ImageMatcher:
    """Feature detection + exhaustive pair matching for a dataset directory.

    Directory layout follows the reference (find_matches.py:13-22): images in
    ``<data_dir>/images``, masks in ``<data_dir>/silhouettes``, artifacts into
    ``<data_dir>/{matches,fundamental,correspondences,visualizations}``.
    """

    def __init__(self, data_dir, config: SfMConfig = SfMConfig(), output_dir=None):
        self.data_dir = Path(data_dir)
        self.config = config
        self.output_dir = Path(output_dir) if output_dir else self.data_dir
        for sub in ("matches", "fundamental", "correspondences", "visualizations"):
            (self.output_dir / sub).mkdir(parents=True, exist_ok=True)
        self.image_dir = self.data_dir / "images"
        self.mask_dir = self.data_dir / "silhouettes"
        self.table: Optional[PairTable] = None
        self.features = None
        self.image_paths: list[Path] = []

    # ---------------------------------------------------------------- images

    def list_images(self, start_idx: int = 0, end_idx: Optional[int] = None):
        paths = sorted(
            p for p in self.image_dir.iterdir() if p.suffix.lower() in _IMG_EXTS
        )
        if end_idx is not None:
            paths = [p for p in paths if start_idx <= self._idx(p) <= end_idx]
        else:
            paths = paths[start_idx:]
        return paths

    @staticmethod
    def _idx(path: Path) -> int:
        digits = "".join(c for c in path.stem if c.isdigit())
        return int(digits) if digits else 0

    def _mask_for(self, img_path: Path) -> Optional[np.ndarray]:
        if not self.mask_dir.exists():
            return None
        for ext in (".pgm", ".png"):
            cand = self.mask_dir / (img_path.stem + ext)
            if cand.exists():
                return load_mask(cand)
        return None

    # ----------------------------------------------------------------- stages

    def detect_all(self, start_idx: int = 0, end_idx: Optional[int] = None, use_mask: bool = True):
        """Run the feature frontend over the image range; returns stacked arrays."""
        self.image_paths = self.list_images(start_idx, end_idx)
        if not self.image_paths:
            raise FileNotFoundError(f"no images in {self.image_dir}")
        t0 = time.time()
        # u8 luma on the wire (4x fewer bytes than f32): the tunnel's
        # host->device path (~37-47 MB/s measured) made pixel upload the
        # detection bottleneck. u8 matches the precision the reference's own
        # detector consumes (cv2 feeds u8 gray to FAST/ORB).
        imgs = [load_image_gray_u8(p) for p in self.image_paths]
        masks = [self._mask_for(p) if use_mask else None for p in self.image_paths]
        from sfm_tpu.utils.transfer import device_get_chunked

        same_shape = len({im.shape for im in imgs}) == 1
        all_masked = all(m is not None for m in masks)
        if same_shape and (all_masked or not any(m is not None for m in masks)):
            # One dispatch for the whole batch (vmapped frontend).
            f = detect_and_describe_batch(
                np.stack(imgs),
                np.stack(masks) if all_masked else None,
                config=self.config.features,
                batch_size=self.config.features.detect_batch,
            )
            desc_d, xy_d, valid_d = f.desc, f.xy, f.valid
        else:
            import jax.numpy as jnp

            feats = [
                detect_and_describe(im, mk, config=self.config.features)
                for im, mk in zip(imgs, masks)
            ]
            desc_d = jnp.stack([f.desc for f in feats])
            xy_d = jnp.stack([f.xy for f in feats])
            valid_d = jnp.stack([f.valid for f in feats])
        # Descriptors stay device-resident (the sweep consumes them there and
        # they are ~MBs — the tunnel's device->host path is slow); only the
        # small keypoint tables come back to host, in chunked transfers.
        xy, valid = device_get_chunked((xy_d, valid_d))
        self.features = {"xy": xy, "desc": desc_d, "valid": valid}
        logger.info(
            "detected features for %d images in %.1fs (mean %d kps)",
            len(self.image_paths),
            time.time() - t0,
            int(self.features["valid"].sum(1).mean()),
        )
        return self.features

    def process_image_range(
        self, start_idx: int = 0, end_idx: Optional[int] = None, use_mask: bool = True
    ) -> PairTable:
        """Full stage 1: detect + all-pairs sweep + per-pair artifacts
        (ref process_image_range :329-350). For large image sets the sweep's
        candidate list is preselected by descriptor retrieval
        (config.retrieval; the reference always sweeps all C(N,2) pairs)."""
        feats = self.detect_all(start_idx, end_idx, use_mask)
        from sfm_tpu.matching.retrieval import (
            retrieval_enabled,
            select_candidate_pairs,
        )

        pairs = None
        n = len(self.image_paths)
        if retrieval_enabled(self.config.retrieval, n):
            from sfm_tpu.config import effective_retrieval_config

            pairs, rstats = select_candidate_pairs(
                feats["desc"], feats["valid"], n,
                effective_retrieval_config(self.config),
            )
            logger.info(
                "retrieval: kept %d of %d candidate pairs (%.1f%%) in %.1fs",
                rstats["kept"], rstats["candidates"],
                100.0 * rstats["keep_frac"], rstats["seconds"],
            )
        self.table = all_pairs_sweep(
            feats["xy"], feats["desc"], feats["valid"], self.config, pairs=pairs
        )
        self._save_pair_artifacts()
        return self.table

    # -------------------------------------------------------------- artifacts

    def _save_pair_artifacts(self):
        """Per accepted pair: pts1/pts2 .npy, F .npz, matches .npz
        (ref save_pair_data :312-327)."""
        t = self.table
        ids = [self._idx(p) for p in self.image_paths]
        for p in t.accepted():
            i, j = (ids[k] for k in t.pairs[p])
            stem = f"pair_{i}_{j}"
            inl = t.inliers[p]
            np.save(self.output_dir / "correspondences" / f"{stem}_pts1.npy", t.xy1[p][inl])
            np.save(self.output_dir / "correspondences" / f"{stem}_pts2.npy", t.xy2[p][inl])
            np.savez(
                self.output_dir / "fundamental" / f"{stem}_F.npz",
                F=t.F[p],
                num_inliers=t.num_inliers[p],
                reprojection_error=t.reprojection_error[p],
            )
            np.savez(
                self.output_dir / "matches" / f"{stem}_matches.npz",
                idx1=t.idx1[p][t.match_valid[p]],
                idx2=t.idx2[p][t.match_valid[p]],
                inliers=inl[t.match_valid[p]],
            )

    def save_results(self, csv_path=None) -> Path:
        """Write matching_results.csv (ref save_results :352-364)."""
        if csv_path is None:
            csv_path = self.output_dir / "matching_results.csv"
        csv_path = Path(csv_path)
        ids = [self._idx(p) for p in self.image_paths]
        rows = self.table.to_records()
        with csv_path.open("w", newline="") as f:
            w = csv.writer(f)
            w.writerow(
                ["image1", "image2", "num_matches", "num_inliers",
                 "inlier_ratio", "reprojection_error", "well_distributed"]
            )
            for r in rows:
                w.writerow(
                    [
                        f"{ids[r['image1']]:04d}.ppm",
                        f"{ids[r['image2']]:04d}.ppm",
                        r["num_matches"],
                        r["num_inliers"],
                        f"{r['inlier_ratio']:.4f}",
                        f"{r['reprojection_error']:.4f}",
                        r["well_distributed"],
                    ]
                )
        if rows:
            logger.info(
                "matching stats: %d pairs, mean matches %.1f, mean inliers %.1f, "
                "mean ratio %.3f",
                len(rows),
                np.mean([r["num_matches"] for r in rows]),
                np.mean([r["num_inliers"] for r in rows]),
                np.mean([r["inlier_ratio"] for r in rows]),
            )
        return csv_path

    def visualize_features_with_mask(self, image_index: int, out_path=None):
        """Keypoints over the image with the silhouette mask shaded
        (ref visualize_features_with_mask :26-47)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        p = self.image_paths[image_index]
        img = load_image_gray(p)
        mask = self._mask_for(p)
        fig, ax = plt.subplots(figsize=(10, 7.5))
        ax.imshow(img, cmap="gray")
        if mask is not None:
            overlay = np.zeros(img.shape + (4,), np.float32)
            overlay[~mask] = (1.0, 0.2, 0.2, 0.25)  # shade background
            ax.imshow(overlay)
        if self.features is not None:
            v = self.features["valid"][image_index]
            xy = self.features["xy"][image_index][v]
            ax.scatter(xy[:, 0], xy[:, 1], s=6, c="lime", marker="x", lw=0.8)
            ax.set_title(f"{p.name}: {int(v.sum())} keypoints")
        ax.set_axis_off()
        if out_path is None:
            out_path = self.output_dir / "visualizations" / f"features_{p.stem}.png"
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return out_path

    def visualize_matches(self, pair_row: int, out_path=None):
        """Side-by-side match overlay: green inliers, red outliers
        (ref visualize_matches :216-244)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = self.table
        i, j = t.pairs[pair_row]
        img1 = load_image_gray(self.image_paths[i])
        img2 = load_image_gray(self.image_paths[j])
        h = max(img1.shape[0], img2.shape[0])
        canvas = np.zeros((h, img1.shape[1] + img2.shape[1]), np.float32)
        canvas[: img1.shape[0], : img1.shape[1]] = img1
        canvas[: img2.shape[0], img1.shape[1] :] = img2
        off = img1.shape[1]

        fig, ax = plt.subplots(figsize=(14, 6))
        ax.imshow(canvas, cmap="gray")
        mv = t.match_valid[pair_row]
        for m in np.nonzero(mv)[0]:
            x1, y1 = t.xy1[pair_row, m]
            x2, y2 = t.xy2[pair_row, m]
            color = "lime" if t.inliers[pair_row, m] else "red"
            ax.plot([x1, x2 + off], [y1, y2], color=color, lw=0.4, alpha=0.7)
        ax.set_title(
            f"pair ({int(i)}, {int(j)}): {int(t.num_inliers[pair_row])}/"
            f"{int(t.num_matches[pair_row])} inliers, "
            f"err {float(t.reprojection_error[pair_row]):.2f}px"
        )
        ax.set_axis_off()
        ids = [self._idx(p) for p in self.image_paths]
        if out_path is None:
            out_path = (
                self.output_dir / "visualizations" / f"pair_{ids[i]}_{ids[j]}.png"
            )
        fig.savefig(out_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return out_path
