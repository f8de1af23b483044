"""Image-connectivity graph + next-best-view policy (host-side)."""

from sfm_tpu.graph.view_selection import SfMGraphSelector  # noqa: F401
