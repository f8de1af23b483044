"""Multi-view feature tracks via union-find over verified pair inliers.

The reference never merges tracks: every track is exactly the 2 views of the
pair that created it (confirmed across all 2,555 shipped points — SURVEY.md
C15), because it re-associates observations by a 2-pixel distance test
(ref sfm_reconstruction.py:209-218) instead of by feature identity. Here
tracks are built once, from feature identity: every inlier match (img_i, kp_a)
~ (img_j, kp_b) of every accepted pair is a union-find merge. Tracks with two
different keypoints in the same image are inconsistent and dropped (the
standard SfM treatment). The result is a padded (T, V) observation table that
the whole incremental engine — PnP gathers, multi-view triangulation, BA
observation lists — reads with plain array indexing.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class TrackTable:
    """Padded track observations. T tracks, up to V views each.

    view_img[t, v] = image id (-1 past the end); view_kp = keypoint id in that
    image; view_xy = pixel coords. Tracks are sorted by length (longest
    first). ``kp_track[img, kp]`` inverts the mapping (-1 = no track).
    """

    view_img: np.ndarray   # (T, V) int32
    view_kp: np.ndarray    # (T, V) int32
    view_xy: np.ndarray    # (T, V, 2) float32
    length: np.ndarray     # (T,) int32
    kp_track: np.ndarray   # (N_images, K) int32 -> track id or -1

    @property
    def num_tracks(self) -> int:
        return self.view_img.shape[0]

    @property
    def max_views(self) -> int:
        return self.view_img.shape[1]

    def images_of(self, t: int):
        n = self.length[t]
        return self.view_img[t, :n]


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(table, xy, num_images: int, max_views: int | None = None) -> TrackTable:
    """Build tracks from a PairTable + stacked keypoint coords.

    table: matching.PairTable; xy: (N, K, 2) keypoint pixel coords.
    Only *inlier* matches of *accepted* pairs contribute.
    """
    N, K = xy.shape[:2]
    uf = _UnionFind(N * K)

    for p in table.accepted():
        i, j = table.pairs[p]
        inl = table.inliers[p] & table.match_valid[p]
        for a, b in zip(table.idx1[p][inl], table.idx2[p][inl]):
            uf.union(int(i) * K + int(a), int(j) * K + int(b))

    # Collect components over nodes that were actually matched.
    touched = set()
    for p in table.accepted():
        i, j = table.pairs[p]
        inl = table.inliers[p] & table.match_valid[p]
        touched.update(int(i) * K + int(a) for a in table.idx1[p][inl])
        touched.update(int(j) * K + int(b) for b in table.idx2[p][inl])

    comps: dict[int, list[int]] = {}
    for node in touched:
        comps.setdefault(uf.find(node), []).append(node)

    # Filter: >= 2 views, consistent (one keypoint per image).
    tracks = []
    for nodes in comps.values():
        imgs = [n // K for n in nodes]
        if len(nodes) < 2 or len(set(imgs)) != len(imgs):
            continue
        nodes.sort()
        tracks.append(nodes)
    tracks.sort(key=len, reverse=True)

    V = max_views or (max(len(t) for t in tracks) if tracks else 2)
    T = len(tracks)
    view_img = np.full((T, V), -1, np.int32)
    view_kp = np.full((T, V), -1, np.int32)
    view_xy = np.zeros((T, V, 2), np.float32)
    length = np.zeros(T, np.int32)
    kp_track = np.full((N, K), -1, np.int32)

    for t, nodes in enumerate(tracks):
        nodes = nodes[:V]
        length[t] = len(nodes)
        for v, node in enumerate(nodes):
            img, kp = node // K, node % K
            view_img[t, v] = img
            view_kp[t, v] = kp
            view_xy[t, v] = xy[img, kp]
            kp_track[img, kp] = t
    return TrackTable(view_img, view_kp, view_xy, length, kp_track)
