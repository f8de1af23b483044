"""The O(N^2) all-pairs sweep as chunked, vmapped, shardable device programs.

Replaces the reference's serial per-pair Python loop (ref
find_matches.py:329-350). Features for all N images live on device as stacked
padded arrays (N, K, ...); candidate pairs are a static (P, 2) index table;
the sweep maps `match_and_verify` over fixed-size pair chunks (one compile,
many launches), optionally sharding the chunk axis over a device mesh so each
device owns a tile of the pair grid (SURVEY.md section 5, "long-context" row).

The result is a PairTable — the in-memory analogue of the reference's
matching_results.csv + per-pair .npz artifacts (ref find_matches.py:312-327).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.config import SfMConfig
from sfm_tpu.matching.verify import match_and_verify


@dataclasses.dataclass
class PairTable:
    """Verified-pair artifacts for a scene (host-side, numpy).

    Rows cover *all* candidate pairs; ``accept`` marks the verified ones
    (the reference only persists accepted pairs — filter on accept for the
    CSV-equivalent view).
    """

    pairs: np.ndarray               # (P, 2) int32 image indices (i < j)
    accept: np.ndarray              # (P,) bool
    num_matches: np.ndarray         # (P,) int32
    num_inliers: np.ndarray         # (P,) int32
    inlier_ratio: np.ndarray        # (P,) float32
    reprojection_error: np.ndarray  # (P,) float32
    well_distributed: np.ndarray    # (P,) bool
    F: np.ndarray                   # (P, 3, 3)
    xy1: np.ndarray                 # (P, M, 2) matched pixels in image i
    xy2: np.ndarray                 # (P, M, 2) matched pixels in image j
    idx1: np.ndarray                # (P, M) keypoint ids in image i
    idx2: np.ndarray                # (P, M) keypoint ids in image j
    match_valid: np.ndarray         # (P, M) bool
    inliers: np.ndarray             # (P, M) bool (subset of match_valid)

    @property
    def num_pairs(self) -> int:
        return int(self.pairs.shape[0])

    def accepted(self) -> np.ndarray:
        return np.nonzero(self.accept)[0]

    def to_records(self):
        """Accepted pairs as dicts — the matching_results.csv row schema
        (ref find_matches.py:352-364)."""
        rows = []
        for p in self.accepted():
            i, j = self.pairs[p]
            rows.append(
                {
                    "image1": int(i),
                    "image2": int(j),
                    "num_matches": int(self.num_matches[p]),
                    "num_inliers": int(self.num_inliers[p]),
                    "inlier_ratio": float(self.inlier_ratio[p]),
                    "reprojection_error": float(self.reprojection_error[p]),
                    "well_distributed": bool(self.well_distributed[p]),
                }
            )
        return rows


def candidate_pairs(num_images: int) -> np.ndarray:
    """All (i, j), i < j — the C(N,2) sweep (ref find_matches.py:332-341)."""
    i, j = np.triu_indices(num_images, k=1)
    return np.stack([i, j], axis=-1).astype(np.int32)


def rescue_disconnected(table: PairTable, num_images: int,
                        min_inliers: int = 8, min_ratio: float = 0.15) -> int:
    """Second-chance acceptance for images with no verified pair.

    The hard gates (>=15 inliers etc., ref find_matches.py:203-214) can leave
    an image with zero accepted pairs, which makes it unregisterable — the
    reference simply loses such cameras (image 0 of bunny has NO pair in its
    shipped CSV). For each disconnected image, re-admit its best pair under
    relaxed gates; downstream PnP/BA/pruning contain the extra risk. Returns
    the number of rescued pairs. Mutates ``table.accept`` in place.

    The defaults mirror VerifyConfig.rescue_min_inliers / rescue_min_ratio —
    pass those fields explicitly (as the engine does) so the sweeps'
    artifact-retention rule and this gate stay in sync.
    """
    deg = np.zeros(num_images, np.int64)
    for p in table.accepted():
        i, j = table.pairs[p]
        deg[i] += 1
        deg[j] += 1
    if not table.accept.flags.writeable:
        # np.asarray over a device array yields a read-only view; rescue is
        # the one consumer that mutates the table, so copy-on-write here.
        table.accept = table.accept.copy()
    rescued = 0
    for img in np.nonzero(deg == 0)[0]:
        rows = np.nonzero(
            ((table.pairs[:, 0] == img) | (table.pairs[:, 1] == img))
            & ~table.accept
            & (table.num_inliers >= min_inliers)
            & (table.inlier_ratio >= min_ratio)
        )[0]
        if len(rows) == 0:
            continue
        best = rows[np.argmax(table.num_inliers[rows])]
        table.accept[best] = True
        rescued += 1
    return rescued


def _sweep_chunk_fn(config: SfMConfig):
    """Build the jitted chunk program: (keys, pair_idx chunk, stacked feats) -> dicts."""
    from sfm_tpu.config import effective_match_config

    mc, vc = effective_match_config(config), config.verify

    def one_pair(key, ij, xy, desc, valid):
        i, j = ij[0], ij[1]
        return match_and_verify(
            key,
            desc[i], xy[i], valid[i],
            desc[j], xy[j], valid[j],
            ratio_threshold=mc.ratio_threshold,
            max_matches=mc.max_matches,
            mutual_check=mc.mutual_check,
            ransac_iters=vc.ransac_iters,
            ransac_threshold=vc.ransac_threshold,
            min_inliers=vc.min_inliers,
            min_inlier_ratio=vc.min_inlier_ratio,
            max_reproj_error=vc.max_reproj_error,
            min_spread=vc.min_spread,
        )

    return jax.vmap(one_pair, in_axes=(0, 0, None, None, None))


def all_pairs_sweep(
    xy,
    desc,
    valid,
    config: SfMConfig = SfMConfig(),
    pairs: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    chunk_size: int = 32,
) -> PairTable:
    """Run matching + verification over every candidate pair.

    xy: (N, K, 2); desc: (N, K, D); valid: (N, K) — stacked padded features.
    pairs: optional (P, 2) candidate list (defaults to all i<j).
    Pads the pair list to a multiple of ``chunk_size`` so exactly one program
    is compiled regardless of P.
    """
    import os
    import time as _time

    profile = bool(os.environ.get("SFM_SWEEP_PROFILE"))
    _t = {"t0": _time.time()}

    def _mark(name, sync=None):
        if not profile:
            return
        if sync is not None:
            jax.block_until_ready(sync)
        now = _time.time()
        print(f"[sweep-profile] {name}: {now - _t['t0']:.2f}s", flush=True)
        _t["t0"] = now

    xy_host = xy if isinstance(xy, np.ndarray) else None
    xy = jnp.asarray(xy)
    desc = jnp.asarray(desc)
    valid = jnp.asarray(valid)
    n = xy.shape[0]
    if pairs is None:
        pairs = candidate_pairs(n)
    pairs = np.asarray(pairs, np.int32)
    P = pairs.shape[0]
    if key is None:
        key = jax.random.key(config.seed)

    pad = (-P) % chunk_size
    pairs_padded = np.concatenate([pairs, np.zeros((pad, 2), np.int32)]) if pad else pairs
    keys = jax.random.split(key, P + pad)

    chunk_fn = jax.jit(_sweep_chunk_fn(config))

    # Dispatch every chunk first (device queue), then download in two phases.
    # The tunnel's device->host path runs ~4 MB/s in <=1 MB slices, so bytes
    # transferred — not compute — dominate large sweeps; see the keep-row
    # selection below.
    from sfm_tpu.utils.transfer import device_get_chunked

    int16_ok = xy.shape[1] < 32768  # keypoint ids fit in int16
    SUMMARY = ("accept", "num_matches", "num_inliers", "inlier_ratio",
               "reprojection_error", "well_distributed", "F")
    pending = []
    for c0 in range(0, P + pad, chunk_size):
        chunk = jnp.asarray(pairs_padded[c0 : c0 + chunk_size])
        out = chunk_fn(keys[c0 : c0 + chunk_size], chunk, xy, desc, valid)
        out = {k: v for k, v in out.items() if k not in ("xy1", "xy2")}
        if int16_ok:
            out["idx1"] = out["idx1"].astype(jnp.int16)
            out["idx2"] = out["idx2"].astype(jnp.int16)
        pending.append(out)
    _mark("dispatch", sync=pending[-1]["accept"])
    merged_dev = jax.tree.map(lambda *xs: jnp.concatenate(xs)[:P], *pending)
    _mark("concat", sync=merged_dev["accept"])

    # Phase 1: per-pair summaries for ALL pairs (small).
    summary = device_get_chunked({f: merged_dev[f] for f in SUMMARY})
    _mark("phase1-summary")

    # Phase 2: per-match arrays only for rows any consumer can read — the
    # accepted pairs (tracks, selector, artifacts) plus rescue-eligible
    # rejected pairs (rescue_disconnected re-admits rows meeting
    # VerifyConfig.rescue_min_inliers — one knob governs both sides).
    # Everything else downloads as zeros for free. Bools travel bit-packed.
    keep_mask = summary["accept"].copy()
    if config.verify.rescue_disconnected:
        keep_mask |= summary["num_inliers"] >= config.verify.rescue_min_inliers
    keep = np.nonzero(keep_mask)[0]
    M = merged_dev["match_valid"].shape[1]
    idx_dtype = np.int16 if int16_ok else np.int32
    idx1 = np.zeros((P, M), idx_dtype)
    idx2 = np.zeros((P, M), idx_dtype)
    match_valid = np.zeros((P, M), bool)
    inliers = np.zeros((P, M), bool)
    if len(keep):
        # Bucket the keep-row count to a multiple of 1024 so the
        # gather+packbits program compiles once per BUCKET, not once per
        # exact count — on the tunnel a fresh server-side compile costs tens
        # of seconds. A 1024-multiple (vs power of two) caps the padding
        # rows' wasted download at ~2 MB.
        bucket = min(-(-len(keep) // 1024) * 1024, P)
        rows_padded = np.concatenate(
            [keep, np.full(bucket - len(keep), keep[0], keep.dtype)]
        ) if bucket > len(keep) else keep[:bucket]
        rows = jnp.asarray(rows_padded)
        picked = device_get_chunked({
            "idx1": merged_dev["idx1"][rows],
            "idx2": merged_dev["idx2"][rows],
            "match_valid": jnp.packbits(merged_dev["match_valid"][rows], axis=-1),
            "inliers": jnp.packbits(merged_dev["inliers"][rows], axis=-1),
        })
        nk = len(keep)
        idx1[keep] = picked["idx1"][:nk]
        idx2[keep] = picked["idx2"][:nk]
        match_valid[keep] = np.unpackbits(
            picked["match_valid"][:nk], axis=-1, count=M)
        inliers[keep] = np.unpackbits(picked["inliers"][:nk], axis=-1, count=M)
    _mark("phase2-rows")

    # Keypoint coords came from host in the common path — reuse that copy
    # instead of pulling the device array back in one unchunked transfer.
    xy_h = xy_host if xy_host is not None else device_get_chunked(xy)
    xy_h = np.asarray(xy_h, np.float32)
    mv = match_valid[..., None]
    xy1 = xy_h[pairs[:, 0][:, None], idx1.astype(np.int64)] * mv
    xy2 = xy_h[pairs[:, 1][:, None], idx2.astype(np.int64)] * mv
    _mark("host-xy-gather")
    return PairTable(
        pairs=pairs,
        accept=summary["accept"],
        num_matches=summary["num_matches"],
        num_inliers=summary["num_inliers"],
        inlier_ratio=summary["inlier_ratio"],
        reprojection_error=summary["reprojection_error"],
        well_distributed=summary["well_distributed"],
        F=summary["F"],
        xy1=xy1.astype(np.float32),
        xy2=xy2.astype(np.float32),
        idx1=idx1.astype(np.int32),
        idx2=idx2.astype(np.int32),
        match_valid=match_valid,
        inliers=inliers,
    )
