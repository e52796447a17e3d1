from .iou import iou_counts, make_iou_fn  # noqa: F401
