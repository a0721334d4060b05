from .overlay import OverlayGraph, Shapes, build_graph, overlay, simplify
from .segments import Segments, build_segments, sort_and_merge
from .split import split_segments
from .fill import compute_fills
from .extract import extract_shapes, ring_area2

__all__ = [
    "OverlayGraph",
    "Shapes",
    "build_graph",
    "overlay",
    "simplify",
    "Segments",
    "build_segments",
    "sort_and_merge",
    "split_segments",
    "compute_fills",
    "extract_shapes",
    "ring_area2",
]
