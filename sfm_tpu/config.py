"""Single configuration schema for the whole framework.

The reference scatters its hyperparameters across module-level constants and
inline literals (utils/sfm_reconstruction.py:14-19, utils/find_matches.py:99-114,
:152, :203; intrinsics at utils/sfm_reconstruction.py:45-49). Here they live in
one frozen dataclass tree so a run is fully described by one object that can be
hashed into jit static args.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Config fields that shipped in an earlier release and were later removed;
# from_dict accepts-and-drops them (with a warning) for forward compat of
# saved --config JSON files.
_REMOVED_FIELDS = {
    "matching": {"use_pallas", "tile_size"},  # Pallas matcher, deleted in 0.3
}


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """SIFT-class feature frontend (replaces FAST+ORB, find_matches.py:96-118).

    Capability parity is "detect keypoints + descriptors, optional silhouette
    mask"; we use a DoG detector + 128-D gradient-histogram descriptor (the
    SIFT family) because float descriptors map matching onto the MXU as a
    single matmul, where 256-bit binary ORB would need popcount gather loops.
    """
    kind: str = "sift"                 # validated in __post_init__.
                                       # "sift": DoG + 128-D float (quality
                                       # default); "orb": FAST-9/16 + 256-bit
                                       # steered binary — the reference's own
                                       # feature class (find_matches.py:96-137),
                                       # for detection-throughput parity. Both
                                       # ride the same MXU matmul matcher
                                       # (features/binary.py docstring).
    fast_threshold: float = 20.0       # FAST ring contrast gate, u8 scale
                                       # (kind="orb"; ref find_matches.py:100)
    orb_levels: int = 3                # binary-path pyramid levels (cv2 ORB
                                       # nlevels mechanism; the reference's
                                       # compute-on-FAST path is effectively
                                       # single-scale — 1 reproduces it).
                                       # 3 levels close the scale gap that
                                       # left bunny image 0 unmatchable
                                       # (round-5 A/B in PROGRESS.md)
    orb_scale_factor: float = 1.35     # pyramid downscale per level (covers
                                       # 1.8x scale change at 3 levels)
    max_keypoints: int = 2048          # fixed per-image budget (padded + masked)
    num_octaves: int = 4
    scales_per_octave: int = 3
    sigma0: float = 1.6                # base blur of octave 0, scale 0
    assumed_blur: float = 0.5          # blur assumed present in the input image
    contrast_threshold: float = 0.006  # DoG |response| gate (OpenCV uses 0.04/n;
                                       # tuned down for the low-texture bunny set)
    edge_threshold: float = 10.0       # Hessian edge ratio gate (SIFT standard)
    descriptor_width: int = 4          # 4x4 spatial bins
    descriptor_bins: int = 8           # 8 orientation bins -> 128-D
    descriptor_scale: float = 3.0      # bin size = scale * kp_sigma
    descriptor_clip: float = 0.2       # clip normalized descriptor, renormalize
    upsample_first_octave: bool = True # SIFT's -1 octave: 2x keypoint yield;
                                       # on bunny this is the difference
                                       # between 31/36 and 35/36 cameras
    mask_dilate: int = 0               # optional mask morphology (ref inverts+closes)
    detect_batch: int = 12             # images per vmapped detection dispatch.
                                       # Measured (v5e, 768x1024): batch 12
                                       # beats 4 by ~1.8x warm (amortized
                                       # dispatch + better VPU occupancy)
                                       # while staying under the working-set
                                       # ceiling; compile ~30-70 s once.

    def __post_init__(self):
        # frontend.py dispatches on exact string equality and every ratio
        # consumer maps thresholds per kind — a typo'd kind would silently
        # select the SIFT path, so fail construction instead.
        if self.kind not in ("sift", "orb"):
            raise ValueError(
                f"FeatureConfig.kind must be 'sift' or 'orb', got {self.kind!r}"
            )


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Pairwise descriptor matching (replaces BFMatcher knn, find_matches.py:141-155)."""
    ratio_threshold: float = 0.75      # Lowe ratio (find_matches.py:152)
    max_matches: int = 1024            # fixed per-pair budget (padded + masked)
    mutual_check: bool = True          # cross-check (reference used crossCheck=False)
    # Note: a fused Pallas top-2 matcher kernel existed through round 2; the
    # round-3 K-sweep A/B (bench.py --matcher-mfu, K=2048/8192/16384) showed
    # the XLA matmul + min-pass path winning 7-10x at every K, so the kernel
    # and its use_pallas/tile_size knobs were removed.


@dataclasses.dataclass(frozen=True)
class RetrievalConfig:
    """Candidate-pair preselection before the full sweep (matching/retrieval.py).

    Beyond-reference capability (the reference always sweeps all C(N,2)
    pairs, find_matches.py:329-350): score every pair by a cheap top-S
    descriptor mini-match count and run the full match+verify program only
    on pairs that clear ``min_score`` or rank in an image's ``top_k``
    neighbors. The TPU analogue of COLMAP's vocab-tree retrieval mode —
    at corridor-1000 the candidate list shrinks ~20x at full verified-pair
    recall (A/B in PROGRESS.md).
    """
    mode: str = "auto"                 # "off" | "on" | "auto" (on when
                                       # num_images >= auto_min_images) |
                                       # "sequential" (ordered captures:
                                       # window pairs only, no scoring)
    sequential_window: int = 10        # j - i <= window for mode="sequential"
    auto_min_images: int = 150         # exhaustive is fine (and higher-recall
                                       # by construction) for small scenes
    subsample: int = 256               # top-S keypoints scored per image
    min_score: int = 8                 # mini-match count to keep a pair
    top_k: int = 10                    # per-image neighbor floor (keeps every
                                       # image connectable regardless of score)
    ratio_threshold: float = 0.75      # Lowe ratio for the mini-match
    chunk_size: int = 1024             # pairs per scoring dispatch
    adaptive: bool = True              # calibrate the bar per image from its
                                       # top_k-th incident score: bar_i =
                                       # clip(beta*s_k(i), floor, min_score).
                                       # Can only RELAX min_score, so clean
                                       # scenes select identically; noisy
                                       # scenes (score distribution shifted
                                       # down wholesale) keep their true
                                       # neighbors (recall-vs-noise A/B in
                                       # PROGRESS.md round 5)
    adaptive_beta: float = 0.5         # fraction of s_k(i) a pair must reach
    min_score_floor: int = 3           # absolute floor: 1-2 mini-matches is
                                       # indistinguishable from noise


@dataclasses.dataclass(frozen=True)
class VerifyConfig:
    """Geometric verification gates (find_matches.py:157-214)."""
    ransac_iters: int = 512            # fixed hypothesis budget (ref: adaptive cv2).
                                       # Measured on bunny: 512 gives identical
                                       # acceptance to 1024 at 1.9x the speed;
                                       # keeps P(all-inlier sample) > 85% down
                                       # to ~0.5 inlier ratio. Raise for dirtier data.
    ransac_threshold: float = 3.0      # px, symmetric epipolar (find_matches.py:157)
    min_inliers: int = 15              # find_matches.py:203
    min_inlier_ratio: float = 0.3      # find_matches.py:203
    max_reproj_error: float = 2.0      # px, mean inlier error (find_matches.py:203)
    min_spread: float = 20.0           # px std both axes/images (find_matches.py:185)
    min_raw_matches: int = 8           # need >=8 for the 8-point solver
    rescue_disconnected: bool = True   # re-admit the best sub-gate pair of an
                                       # otherwise pairless image (the ref
                                       # just loses such cameras)
    rescue_min_inliers: int = 8        # relaxed gates for that re-admission;
    rescue_min_ratio: float = 0.15     # the sweeps ALSO use rescue_min_inliers
                                       # to decide which rejected rows keep
                                       # their per-match artifacts, so rescue
                                       # and artifact retention stay coupled
                                       # through this one knob


@dataclasses.dataclass(frozen=True)
class PnPConfig:
    """PnP registration (sfm_reconstruction.py:14-18, :232-261)."""
    ransac_iters: int = 2048           # ref RANSAC_ITERATIONS = 1000; doubled
                                       # because fixed-budget RANSAC has no
                                       # adaptive termination headroom
    reproj_threshold: float = 8.0      # ref PNP_REPROJECTION_ERROR
    min_inliers: int = 15              # ref PNP_MIN_INLIERS
    min_matches: int = 20              # ref MIN_MATCHES: minimum 2D-3D pool
                                       # size before attempting PnP at all
                                       # (sfm_reconstruction.py:15, :324)
    candidate_batch: int = 8           # candidates PnP'd per device dispatch
                                       # (the loop is tunnel-latency-bound;
                                       # all passers register in score order)
    refine_iters: int = 10             # Gauss-Newton polish on inliers
    sample_size: int = 3               # 3 = minimal P3P (Grunert quartic via
                                       # Durand-Kerner, up to 4 exact poses
                                       # per sample): P(all-inlier) = rho^3,
                                       # which keeps late registrations
                                       # tractable down to ~0.15 inlier
                                       # ratio where the 6-point DLT path
                                       # finds nothing (measured); also
                                       # faster (28.8 vs 38.1 ms @ 2048
                                       # hypotheses). >= 6 selects the
                                       # DLT + per-hypothesis-GN path
    budget: int = 2048                 # padded 2D-3D correspondence capacity
    min_inlier_ratio: float = 0.4      # PnP consensus must also cover this
                                       # fraction of the correspondence pool
                                       # (one low-ratio registration measurably
                                       # poisons BA: bunny 0.30 -> 1.02 px);
                                       # the ref has no such gate
    min_inliers_floor: int = 6         # weak-connectivity fallback gate: an
                                       # image whose whole correspondence pool
                                       # is < min_inliers may register at
                                       # max(floor, 0.8*pool) — BA + pruning
                                       # contain the extra risk
    guided: bool = True                # guided registration for images the
                                       # pair graph failed: match the image's
                                       # descriptors directly against the
                                       # triangulated model's observation
                                       # descriptors (2D-3D localization; the
                                       # reference just loses such cameras)
    guided_ratio: float = 0.9          # relaxed Lowe ratio for guided 2D-3D
                                       # matches (second-best from a DIFFERENT
                                       # track, COLMAP-style)
    guided_pool: int = 8192            # model-descriptor budget (up to 2
                                       # observations per triangulated track)
    guided_min_inlier_ratio: float = 0.15  # consensus-fraction leg of the
                                       # guided acceptance gate: required
                                       # inliers = max(guided_min_inliers,
                                       # ratio * pool). Was a lone 0.3 —
                                       # which scales the bar with pool
                                       # size, so a richer (multi-scale)
                                       # match pool RAISED the bar and
                                       # rejected correct rescues. Round-5
                                       # GT-calib measurement: garbage
                                       # guided poses (50-84 deg wrong) sat
                                       # at 5-9 inliers / 6-21% consensus;
                                       # genuine ones at 32-46 / 30-40% —
                                       # max(20, 0.15*pool) separates them
                                       # with >2x margin on both legs
    guided_min_inliers: int = 20       # absolute-count leg of the guided
                                       # acceptance gate (see above)
    guided_iters: int = 8192           # RANSAC budget for guided PnP: rescue
                                       # targets sit at ~0.3-0.4 inlier
                                       # ratio; with P3P samples (rho^3 per
                                       # draw) 8192 draws give >200 expected
                                       # all-inlier samples at rho=0.3


@dataclasses.dataclass(frozen=True)
class TriangulationConfig:
    max_reproj_error: float = 4.0      # px gate (sfm_reconstruction.py:299)
    min_views: int = 2
    cadence: int = 1                   # (re)triangulate every k registrations
                                       # (1 = reference behavior; >1 trades
                                       # point freshness for loop wall-clock)
    min_parallax_deg: float = 0.0      # optional parallax gate (0 = off, ref has none)
    robust_rounds: int = 1             # outlier-view re-solve rounds in the
                                       # multi-view DLT: one wrong match in a
                                       # track no longer vetoes the whole
                                       # point (0 = the reference-style
                                       # all-views gate)
    seed_pair_views: int = 8           # candidate views for seed-pair
                                       # consensus (C(n,2) 2-view hypotheses
                                       # per rescued track; <2 disables)
    seed_pair_scope: str = "failed"    # "failed": consensus only for tracks
                                       # the joint DLT rejects (a second
                                       # dispatch over just those — measured
                                       # corridor-200: 297/300 failures were
                                       # 2-view recoverable, so paying 28
                                       # hypotheses on PASSING tracks bought
                                       # nothing); "all": every track, every
                                       # call (round-3 behavior); "off"


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Bundle adjustment (replaces scipy TRF, sfm_reconstruction.py:401-549)."""
    max_iterations: int = 30           # LM outer iterations
    init_lambda: float = 1e-3
    lambda_up: float = 4.0
    lambda_down: float = 2.0
    min_lambda: float = 1e-9
    max_lambda: float = 1e6
    huber_delta: float = 2.0           # px (ref uses huber loss, :511)
    max_obs: int = 1_000_000           # single-chip HBM ceiling on the flat
                                       # BA observation table. The engine
                                       # compacts invalid track slots out
                                       # and, above this, subsamples
                                       # observations (each track's first
                                       # two views are protected so every
                                       # point stays constrained). pixel-500
                                       # measured: the relaxed first global
                                       # triangulation fed BA 1.75M slots
                                       # and crashed the 16 GB chip; full
                                       # fidelity at that scale belongs on
                                       # the obs-sharded multi-chip BA
                                       # (parallel/run_ba_sharded). 0 = off
    cg_iters: int = 50                 # CG iterations on the Schur system
    cg_tol: float = 1e-6
    use_dense_schur_below: int = 256   # cams <= this -> direct dense-S build
                                       # + Cholesky (round-3 A/B, v5e: dense
                                       # beats PCG at every tested size once
                                       # S is assembled from the
                                       # co-observation table instead of
                                       # 6C+4 matvecs — 36 cams: 28.0 vs
                                       # 20.7 LM it/s; 100: 6.4 vs 4.9;
                                       # 256: 3.45 vs 2.87. Above 256 the
                                       # (6C+4)^2 factor grows cubically;
                                       # PCG stays the scalable path)
    optimize_intrinsics: bool = True   # shared fx,fy,cx,cy (ref: per-cam then mean)
    per_camera_intrinsics: bool = False  # optimize fx,fy,cx,cy PER CAMERA
                                       # (10 params/cam, the reference's
                                       # parameterization, ref :415-427) with
                                       # the same per-camera regularization;
                                       # the shared K is refreshed to the
                                       # valid-camera mean after the solve
                                       # (ref :532-538). Needed for
                                       # multi-camera datasets; the shared
                                       # default is better-posed when one
                                       # physical camera took every image
    intrinsics_reg_weight: float = 0.1 # ref regularization weight (:498)
    frequency: int = 7                 # run BA every k registrations (ref :19)
    local_window: int = 0              # >0: periodic BAs optimize only the
                                       # most recent k registered cameras
                                       # (earlier poses fixed; points still
                                       # free) — windowed local BA for long
                                       # ordered sequences (BASELINE config
                                       # #3); the final BA is always global
    ftol: float = 1e-4                 # relative cost decrease stop (ref :512)
    blocked_min_fill: float = 0.3      # large scenes (cams >
                                       # use_dense_schur_below) run the
                                       # scatter-free (P,V) blocked layout
                                       # when the track table's fill ratio
                                       # (valid obs / (T*V)) reaches this;
                                       # below it, padding waste exceeds the
                                       # scatter cost and the flat layout
                                       # wins (measured +16% blocked on
                                       # uniform tracks)
    f64_normal_equations: bool = False # build/solve the (Schur) normal
                                       # equations in float64 (SURVEY.md
                                       # section 7 hard-part #1: f32 normal
                                       # equations square the Jacobian's
                                       # condition number and stall LM on
                                       # large ill-conditioned scenes).
                                       # Residuals/Jacobians stay f32; only
                                       # the reduction + solve island is
                                       # f64. Native on CPU hosts; TPU
                                       # emulates f64 slowly - use for
                                       # verification or CPU-side BA
    prune_multiplier: float = 3.0      # post-BA obs pruning at mult * tri gate
                                       # (0 = off; the reference never prunes)


@dataclasses.dataclass(frozen=True)
class SelectConfig:
    """Next-best-view scoring weights (image_selector.py:71-75, :146-151)."""
    w_degree: float = 0.4
    w_betweenness: float = 0.3
    w_inliers: float = 0.3
    w_importance: float = 0.3
    w_connection_quality: float = 0.4
    w_breadth: float = 0.2
    w_visibility: float = 0.1          # ref computes this but it is constant (bug); we fix it
    top_k: int = 5


@dataclasses.dataclass(frozen=True)
class GlobalInitConfig:
    """Global SfM initialization (rotation + translation averaging).

    Beyond-reference capability (the reference only grows incrementally from
    a two-view seed, sfm_reconstruction.py:61-155): solve every camera pose
    at once from the verified-pair graph, triangulate all tracks, then
    polish with global BA. See reconstruction/global_init.py.
    """
    enabled: bool = False              # pipeline uses run_global_reconstruction
    min_pair_inliers: int = 15         # pairs entering the averaging problem
    pair_matches: int = 256            # inlier subsample per pair for the
                                       # relative-pose GN (a 5-dof problem
                                       # saturates well below the budget;
                                       # bunny A/B in PROGRESS.md)
    gn_iters: int = 10                 # Sampson Gauss-Newton polish steps
    power_iters: int = 48              # spectral power-iteration steps
    tree_init: bool = True             # seed both averagings from a
                                       # max-weight spanning-tree composition:
                                       # spectral/CG propagate one graph-hop
                                       # per iteration, so a zero start never
                                       # converges on large-diameter graphs
                                       # (1000-cam corridor: 15.5 deg median
                                       # rotation error vs GT without it)
    refine_iters: int = 10             # Lie-algebra IRLS rounds on rotations
                                       # (annealed Huber; the workhorse — the
                                       # spectral init alone is fragile when
                                       # the graph carries outlier pairs)
    als_rounds: int = 3                # translation IRLS reweighting rounds
    cg_iters: int = 80                 # CG iterations per ridge solve
    cycle_sigma_deg: float = 15.0      # soft cycle-consistency edge weight
                                       # scale (0 disables); contains the
                                       # false-consensus pairs a 2-view gate
                                       # cannot see
    tri_relax: float = 3.0             # first-pass triangulation gate multiplier
                                       # (averaged poses are pre-BA: a strict
                                       # gate would reject most true points)
    refine_rounds: int = 2             # BA+prune+retriangulate alternation
                                       # rounds after the relaxed first pass
                                       # (tuned on bunny+corridor; raise for
                                       # hostile graphs — more outliers or
                                       # weak cycles need more alternations)
    polish: bool = False               # pose-graph drift correction for the
                                       # INCREMENTAL path: after the
                                       # registration loop, re-solve every
                                       # registered camera by rotation +
                                       # translation averaging SEEDED from
                                       # the incremental poses, then
                                       # retriangulate + BA. Removes the
                                       # accumulated drift BA cannot see
                                       # (1000-cam corridor: 7.5 deg median
                                       # GT rotation error at 0.45 px).
                                       # Independent of ``enabled`` (which
                                       # replaces the incremental loop
                                       # entirely)
    polish_min_gain: float = 0.2       # adopt on a material FRACTIONAL drop
                                       # of the median pair-rotation
                                       # residual. NOTE: pairwise residuals
                                       # are nearly blind to SMOOTH drift
                                       # (corridor-1000, measured: 7.49 deg
                                       # median GT error reads as 0.10 deg
                                       # pairwise, because window-12 pair
                                       # endpoints share ~99% of the bend) —
                                       # the absolute gate below is the one
                                       # that fires on such scenes
    polish_max_residual_deg: float = 1.0
                                       # ...OR adopt whenever the polished
                                       # model is absolutely self-consistent:
                                       # post-polish median pair residual at
                                       # or below this AND the gross-outlier
                                       # edge fraction at or below
                                       # polish_max_outlier_frac. On such
                                       # averaging-friendly graphs the
                                       # averaged poses are trustworthy
                                       # whether or not the incremental ones
                                       # were bent (if they weren't, polish
                                       # is a no-op up to noise). Hostile
                                       # graphs (bunny: 9.89 deg post
                                       # residual, 24% outlier edges) still
                                       # refuse
    polish_max_outlier_frac: float = 0.1
    polish_rollback_min_points: float = 0.6
                                       # safety net: after adopting + the
                                       # rebuild, if the polished model kept
                                       # fewer than this fraction of the
                                       # incremental model's points (or lost
                                       # registered cameras), restore the
                                       # saved incremental state — polish is
                                       # then strictly non-degrading
    consistency_warn_deg: float = 10.0 # an edge whose measured rotation
                                       # disagrees with the final model by
                                       # more than this counts as graph
                                       # corruption; >10% such edges logs an
                                       # averaging-hostile-graph warning
                                       # (reprojection error is blind to
                                       # metric warps — bunny: 0.33 px at
                                       # 34%-of-scene ATE)
    min_edges_per_camera: float = 1.0  # pre-check: a pair graph with fewer
                                       # than ~N edges cannot even be
                                       # connected — one-shot averaging on
                                       # it returns confidently-wrong poses
                                       # (pixel-200 ORB, measured: 118 edges
                                       # / 200 cams "placed" 176 cameras at
                                       # 162 deg median GT error). Below
                                       # this the router runs the
                                       # incremental engine instead, which
                                       # registers only what the graph
                                       # actually supports
    fallback_outlier_frac: float = 0.3 # post-check on the same diagnostic
                                       # consistency_warn_deg warns about:
                                       # above this fraction the one-shot
                                       # global model grossly disagrees
                                       # with its own pair measurements, so
                                       # the router discards it and reruns
                                       # incrementally (honest partial
                                       # model > confident garbage)


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Shared pinhole intrinsics (sfm_reconstruction.py:40-49)."""
    width: int = 1024
    height: int = 768
    fx: float = 1228.0
    fy: float = 1228.0
    cx: float = 512.0
    cy: float = 384.0

    def K(self):
        import numpy as np
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """Device-mesh layout for the sharded stages (matching sweep + BA)."""
    data_axis: str = "data"            # pairs / observations are sharded over this
    mesh_shape: Optional[Tuple[int, ...]] = None  # None -> all local devices, 1-D


@dataclasses.dataclass(frozen=True)
class SfMConfig:
    features: FeatureConfig = dataclasses.field(default_factory=FeatureConfig)
    matching: MatchConfig = dataclasses.field(default_factory=MatchConfig)
    retrieval: RetrievalConfig = dataclasses.field(default_factory=RetrievalConfig)
    verify: VerifyConfig = dataclasses.field(default_factory=VerifyConfig)
    pnp: PnPConfig = dataclasses.field(default_factory=PnPConfig)
    triangulation: TriangulationConfig = dataclasses.field(default_factory=TriangulationConfig)
    ba: BAConfig = dataclasses.field(default_factory=BAConfig)
    select: SelectConfig = dataclasses.field(default_factory=SelectConfig)
    global_init: GlobalInitConfig = dataclasses.field(default_factory=GlobalInitConfig)
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    sharding: ShardingConfig = dataclasses.field(default_factory=ShardingConfig)
    seed: int = 0

    def replace(self, **kw) -> "SfMConfig":
        return dataclasses.replace(self, **kw)

    # -- serialization ------------------------------------------------------
    # One JSON file fully describes a run (the reference scatters its knobs
    # across module constants with no way to record them).

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, path=None) -> str:
        import json

        text = json.dumps(self.to_dict(), indent=2)
        if path is not None:
            from pathlib import Path

            Path(path).write_text(text)
        return text

    @classmethod
    def from_dict(cls, d: dict) -> "SfMConfig":
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            sub = {
                "features": FeatureConfig, "matching": MatchConfig,
                "retrieval": RetrievalConfig,
                "verify": VerifyConfig, "pnp": PnPConfig,
                "triangulation": TriangulationConfig, "ba": BAConfig,
                "select": SelectConfig, "global_init": GlobalInitConfig,
                "camera": CameraConfig, "sharding": ShardingConfig,
            }.get(f.name)
            if sub is not None:
                unknown = set(v) - {sf.name for sf in dataclasses.fields(sub)}
                # Knobs that existed in released config schemas and were
                # since removed: accept-and-drop with a warning so old
                # --config files keep loading (v0.2 serialized the Pallas
                # matcher knobs this release deleted).
                removed = unknown & _REMOVED_FIELDS.get(f.name, set())
                if removed:
                    import logging

                    logging.getLogger(__name__).warning(
                        "ignoring removed %s config fields: %s",
                        f.name, sorted(removed))
                    v = {k: x for k, x in v.items() if k not in removed}
                    unknown -= removed
                if unknown:
                    raise ValueError(f"unknown {f.name} config fields: {sorted(unknown)}")
                if f.name == "sharding" and v.get("mesh_shape") is not None:
                    v = dict(v, mesh_shape=tuple(v["mesh_shape"]))
                kw[f.name] = sub(**v)
            else:
                kw[f.name] = v
        return cls(**kw)

    @classmethod
    def from_json(cls, path_or_text) -> "SfMConfig":
        import json
        from pathlib import Path

        s = str(path_or_text)
        if not s.lstrip().startswith("{"):
            s = Path(s).read_text()
        return cls.from_dict(json.loads(s))


def map_ratio_for_kind(ratio: float, kind: str) -> float:
    """Map a NATIVE-metric Lowe ratio into the matcher's squared-L2 metric.

    The ratio test is defined on NATIVE descriptor distances — L2 for float
    descriptors, Hamming for binary (reference find_matches.py:150-153:
    ``m.distance < 0.75 * n.distance`` under NORM_HAMMING). The matcher
    compares SQUARED L2 (core.py:83: ``d1 < r^2 * d2``): for unit float
    descriptors that is exactly the L2 ratio test, but for ±1-encoded binary
    descriptors squared-L2 is LINEAR in Hamming (features/binary.py), so the
    configured ratio r must enter the squared comparison as sqrt(r) to test
    ``hamming1 < r * hamming2``. Every consumer that hands a ratio threshold
    to the matcher must route it through this mapping (or one of the
    ``effective_*`` helpers below).
    """
    return float(ratio) ** 0.5 if kind == "orb" else float(ratio)


def effective_match_config(config: "SfMConfig") -> MatchConfig:
    """MatchConfig with the Lowe ratio mapped into the matcher's squared-L2
    metric per the feature kind (``map_ratio_for_kind``)."""
    return dataclasses.replace(
        config.matching,
        ratio_threshold=map_ratio_for_kind(
            config.matching.ratio_threshold, config.features.kind),
    )


def effective_retrieval_config(config: "SfMConfig") -> RetrievalConfig:
    """RetrievalConfig with the mini-match Lowe ratio mapped into the
    scorer's squared-L2 metric — same mapping as ``effective_match_config``
    (the retrieval scorer reuses the matcher's ``d1 < r^2 * d2`` comparison,
    retrieval.py:59)."""
    return dataclasses.replace(
        config.retrieval,
        ratio_threshold=map_ratio_for_kind(
            config.retrieval.ratio_threshold, config.features.kind),
    )


def effective_guided_ratio(config: "SfMConfig") -> float:
    """PnPConfig.guided_ratio mapped into the guided 2D-3D matcher's
    squared-L2 comparison (incremental._guided_match uses the same
    ``d1 < r^2 * d2`` form as the pair matcher)."""
    return map_ratio_for_kind(config.pnp.guided_ratio, config.features.kind)
