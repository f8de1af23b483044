"""Pipeline orchestrator: preprocess -> reconstruct -> export.

Parity with the reference's SfMPipeline (main.py:117-277): directory setup +
validation, stage sequencing with wall-clock timing, exception -> bool
conversion, and the same on-disk stage handoff (the preprocess artifacts are
a complete restart point for reconstruct — SURVEY.md section 1/5.4).
"""
from __future__ import annotations

import contextlib
import dataclasses
import logging
import pickle
import time
from pathlib import Path
from typing import Optional

from sfm_tpu.config import SfMConfig
from sfm_tpu.utils.observability import Metrics, stage, trace_to

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class PipelineArgs:
    """CLI-facing knobs (main.py:52-115 flag parity)."""

    data_dir: str = "."
    output_dir: Optional[str] = None
    start_idx: int = 0
    end_idx: int = 999
    num_images: int = 1000
    min_matches: int = 20
    use_mask: bool = True
    export_colmap: bool = True
    export_meshlab: bool = True
    export_bundler: bool = False   # Bundler v0.3 bundle.out (+ list.txt)
    export_nvm: bool = False       # VisualSFM NVM_V3 model
    visualize: bool = False
    trace_dir: Optional[str] = None   # xprof-compatible device trace output
    checkpoint_dir: Optional[str] = None   # mid-reconstruction checkpoints
    checkpoint_every: int = 0              # registrations between checkpoints
    resume_checkpoint: Optional[str] = None  # resume from this .npz


class SfMPipeline:
    def __init__(self, args: PipelineArgs, config: SfMConfig = SfMConfig()):
        self.args = args
        self.config = config
        self.data_dir = Path(args.data_dir)
        self.output_dir = Path(args.output_dir or args.data_dir)
        self._validate_inputs()
        self._setup_directories()
        self.matcher = None
        self.result = None
        self._desc_host = None
        self.metrics = Metrics()

    def _maybe_trace(self):
        """Device-trace context when ``trace_dir`` is set, else a no-op."""
        if self.args.trace_dir:
            return trace_to(self.args.trace_dir)
        return contextlib.nullcontext()

    def save_metrics(self):
        """Metrics JSON next to the run artifacts (SURVEY.md section 5)."""
        self.metrics.save(self.output_dir / "metrics.json")
        # The effective config rides along so any run is reproducible.
        self.config.to_json(self.output_dir / "config.json")

    # ----------------------------------------------------------- validation

    def _validate_inputs(self):
        """Range + directory checks (main.py:38-50, :159-187)."""
        a = self.args
        if not (0 <= a.start_idx <= 999):
            raise ValueError(f"start_idx {a.start_idx} outside [0, 999]")
        if not (0 <= a.end_idx <= 999):
            raise ValueError(f"end_idx {a.end_idx} outside [0, 999]")
        if a.start_idx > a.end_idx:
            raise ValueError("start_idx > end_idx")
        if not (2 <= a.num_images <= 1000):
            raise ValueError(f"num_images {a.num_images} outside [2, 1000]")
        if not (20 <= a.min_matches <= 1000):
            raise ValueError(f"min_matches {a.min_matches} outside [20, 1000]")
        if not self.data_dir.exists():
            raise FileNotFoundError(f"data_dir {self.data_dir} does not exist")

    def _setup_directories(self):
        for sub in ("reconstruction", "exports"):
            d = self.output_dir / sub
            d.mkdir(parents=True, exist_ok=True)
            probe = d / ".write_probe"
            probe.write_text("ok")  # write-permission probe (main.py:150-156)
            probe.unlink()

    # --------------------------------------------------------------- stages

    def run_preprocessing(self) -> bool:
        """Stage 1 (main.py:189-213)."""
        from sfm_tpu.matching.api import ImageMatcher

        t0 = time.time()
        try:
            with stage("preprocess", self.metrics), self._maybe_trace():
                self.matcher = ImageMatcher(
                    self.data_dir, self.config, output_dir=self.output_dir
                )
                self.matcher.process_image_range(
                    self.args.start_idx, self.args.end_idx, use_mask=self.args.use_mask
                )
                self.matcher.save_results()
            self.metrics.log("pairs/accepted", int(len(self.matcher.table.accepted())))
            import numpy as np
            import jax.numpy as jnp
            from sfm_tpu.utils.transfer import device_get_chunked

            # Descriptors enable guided (2D-3D localization) registration in
            # the reconstruct stage; persisted fp16 with a size guard so the
            # stage-boundary artifact stays reasonable at 1000-image scale.
            # Size-check BEFORE transferring (skip the download entirely when
            # the guard would drop it), cast to fp16 on device (halves the
            # bytes over the slow tunnel), and fetch chunked — the tunnel's
            # device->host path collapses above ~2 MB per transfer.
            blob = {
                "table": self.matcher.table,
                "xy": self.matcher.features["xy"],
                "valid": self.matcher.features["valid"],
                "image_paths": [str(p) for p in self.matcher.image_paths],
            }
            desc_d = self.matcher.features["desc"]
            if 2 * int(np.prod(desc_d.shape)) <= 512 * 1024 * 1024:
                self._desc_host = device_get_chunked(desc_d.astype(jnp.float16))
                blob["desc"] = self._desc_host
            else:
                self._desc_host = None  # guided registration off at this scale
            with (self.output_dir / "pair_table.pkl").open("wb") as f:
                pickle.dump(blob, f)
            if len(self.matcher.table.accepted()):
                # Connectivity-graph PNG (ref image_selector.py:162-218 writes
                # image_graph.png during selector construction).
                from sfm_tpu.graph import SfMGraphSelector

                try:
                    SfMGraphSelector.from_pair_table(self.matcher.table).visualize_graph(
                        self.output_dir / "image_graph.png"
                    )
                except Exception:
                    logger.warning("graph visualization failed", exc_info=True)
            if self.args.visualize and len(self.matcher.table.accepted()):
                # One overlay PNG per verified pair, like the reference's
                # unconditional per-pair visualization (find_matches.py:295).
                for p in self.matcher.table.accepted():
                    self.matcher.visualize_matches(int(p))
            self.save_metrics()
            logger.info("preprocessing done in %.1fs", time.time() - t0)
            return True
        except Exception:
            logger.exception("preprocessing failed")
            return False

    def run_reconstruction(self) -> bool:
        """Stage 2 + export (main.py:215-260)."""
        from sfm_tpu.reconstruction import StructureFromMotion
        from sfm_tpu.io.export import save_reconstruction, SfMExporter

        t0 = time.time()
        try:
            if self.matcher is not None and self.matcher.table is not None:
                table = self.matcher.table
                xy = self.matcher.features["xy"]
                # Host fp16 copy made at stage-1 exit (None when the size
                # guard skipped it) — never the raw device array, which the
                # engine would pull down in one giant transfer.
                desc = getattr(self, "_desc_host", None)
                feat_valid = self.matcher.features["valid"]
                self._image_paths = [str(p) for p in self.matcher.image_paths]
            else:
                blob = pickle.loads((self.output_dir / "pair_table.pkl").read_bytes())
                table = blob["table"]
                xy = blob["xy"]
                desc = blob.get("desc")
                feat_valid = blob.get("valid")
                self._image_paths = blob.get("image_paths")
            with stage("reconstruct", self.metrics), self._maybe_trace():
                sfm = StructureFromMotion(table, xy, self.config, metrics=self.metrics,
                                          desc=desc, feat_valid=feat_valid)
                if self.args.resume_checkpoint:
                    sfm.load_checkpoint(self.args.resume_checkpoint)
                    logger.info("resumed from %s (%d cameras placed)",
                                self.args.resume_checkpoint, len(sfm.reg_order))
                # run_reconstruction routes to the global path itself when
                # global_init.enabled (and falls back with a warning when
                # num_images/checkpointing make the one-shot path unusable).
                self.result = sfm.run_reconstruction(
                    self.args.num_images,
                    checkpoint_dir=self.args.checkpoint_dir,
                    checkpoint_every=self.args.checkpoint_every,
                )
            for k in ("num_cameras", "num_points", "mean_reprojection_error"):
                self.metrics.log(f"reconstruction/{k}", self.result.stats[k])
            self._evaluate_against_gt()
            recon_dir = self.output_dir / "reconstruction"
            save_reconstruction(self.result, recon_dir)

            exporter = SfMExporter(
                result=self.result,
                image_size=(self.config.camera.width, self.config.camera.height),
            )
            if self.args.export_colmap:
                exporter.export_colmap(self.output_dir / "exports" / "colmap")
                exporter.create_colmap_database(
                    self.output_dir / "exports" / "colmap" / "database.db"
                )
            if self.args.export_meshlab:
                exporter.export_meshlab(self.output_dir / "exports" / "meshlab.ply")
            if self.args.export_bundler:
                bdir = self.output_dir / "exports" / "bundler"
                bdir.mkdir(parents=True, exist_ok=True)
                exporter.export_bundler(bdir / "bundle.out", bdir / "list.txt")
            if self.args.export_nvm:
                exporter.export_nvm(self.output_dir / "exports" / "model.nvm")
            self.save_metrics()
            logger.info("reconstruction done in %.1fs", time.time() - t0)
            return True
        except Exception:
            logger.exception("reconstruction failed")
            return False

    def _evaluate_against_gt(self):
        """Pose accuracy vs data_dir/calib ground truth, when shipped.

        Adds rot_err_deg_median / ate(_rel) to the result stats (and so to
        stats.json + metrics.json). The bunny set carries 36 GT projection
        matrices the reference never reads; reprojection error alone is
        self-consistency, not ground truth."""
        calib = self.data_dir / "calib"
        if self.result is None or not calib.is_dir():
            return
        try:
            from sfm_tpu.io.calib import evaluate_result_against_gt

            # image_paths maps engine camera indices to calib file stems —
            # required when --start_idx > 0, where the bare engine index
            # would silently compare camera 0 against calib 0000.
            names = getattr(self, "_image_paths", None)
            if names is None and self.args.start_idx != 0:
                logger.info("skipping GT eval: no image-path map and "
                            "start_idx=%d (ids would misalign)",
                            self.args.start_idx)
                return
            ev = evaluate_result_against_gt(calib, self.result, image_names=names)
            if ev is None:
                return
            self.result.stats.update({f"gt_{k}": v for k, v in ev.items()})
            for k in ("rot_err_deg_median", "ate", "ate_rel"):
                self.metrics.log(f"reconstruction/gt_{k}", ev[k])
            logger.info(
                "GT pose accuracy (%d cams): rot med %.3f deg, ATE %.4f (%.2f%% of scene)",
                ev["n_eval"], ev["rot_err_deg_median"], ev["ate"],
                100 * ev["ate_rel"],
            )
        except Exception:
            logger.warning("ground-truth evaluation failed", exc_info=True)

    def run_full_pipeline(self) -> bool:
        """Stage 1 + 2 (main.py:262-277)."""
        return self.run_preprocessing() and self.run_reconstruction()
