"""sfm_tpu — a TPU-native Structure-from-Motion framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of the reference CPU pipeline
(Sovik-Ghosh/SFM): feature detection/description, exhaustive pairwise matching,
RANSAC geometric verification, graph-guided incremental reconstruction, sparse
Levenberg-Marquardt bundle adjustment, and COLMAP/PLY export — all built as
fixed-shape batched array programs that map onto the TPU MXU/VPU and shard over
a `jax.sharding.Mesh`.

Public API (mirrors the reference's `utils/__init__.py:3-13` surface):
    ImageMatcher          — feature detect / match / verify   (ref utils/find_matches.py)
    StructureFromMotion   — incremental reconstruction        (ref utils/sfm_reconstruction.py)
    SfMGraphSelector      — next-best-view selection          (ref utils/image_selector.py)
    SfMExporter           — COLMAP / PLY export               (ref utils/export.py)
plus the TPU-native config and pipeline entry points.

Array conventions used throughout:
  * poses are world->camera: ``x_cam = R @ X + t`` (OpenCV convention, as the
    reference uses via cv2.recoverPose / solvePnP).
  * pixel coordinates are (x, y) with the origin at the top-left.
  * every variable-length collection (keypoints, matches, tracks) is a padded
    fixed-shape array with a boolean/int validity mask so everything stays
    jit-compilable with static shapes.
"""

__version__ = "0.3.0"

import os as _os

from sfm_tpu.config import SfMConfig  # noqa: F401


def _enable_compilation_cache():
    """Point JAX at a persistent on-disk compilation cache.

    Big programs compile remotely in 20-40 s on the tunneled TPU; the cache
    turns every repeat-process run (CLI invocations, benchmarks, the driver's
    checks) into a ~ms cache hit. Respects an explicit user setting.
    """
    if "JAX_COMPILATION_CACHE_DIR" in _os.environ:
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
            jax.config.update("jax_compilation_cache_dir", _os.path.abspath(cache))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — never block import on cache setup
        pass


_enable_compilation_cache()


def __getattr__(name):
    # Lazy imports keep `import sfm_tpu` light (no jax trace-time work).
    if name == "ImageMatcher":
        from sfm_tpu.matching.api import ImageMatcher
        return ImageMatcher
    if name == "StructureFromMotion":
        from sfm_tpu.reconstruction.incremental import StructureFromMotion
        return StructureFromMotion
    if name == "SfMGraphSelector":
        from sfm_tpu.graph.view_selection import SfMGraphSelector
        return SfMGraphSelector
    if name == "SfMExporter":
        from sfm_tpu.io.export import SfMExporter
        return SfMExporter
    if name == "SfMPipeline":
        from sfm_tpu.pipeline import SfMPipeline
        return SfMPipeline
    raise AttributeError(f"module 'sfm_tpu' has no attribute {name!r}")
