from avdn_tpu.geometry.quad import (
    polygon_area,
    convex_hull,
    clip_convex,
    quad_iou,
    quad_iou_batch,
    point_in_convex_quad,
    clip_segment_to_quad,
    orient_ccw,
)
from avdn_tpu.geometry.transforms import (
    DEG_TO_M,
    get_direction,
    name_the_direction,
    gps_to_img_coords,
)

__all__ = [
    "polygon_area",
    "convex_hull",
    "clip_convex",
    "quad_iou",
    "quad_iou_batch",
    "point_in_convex_quad",
    "clip_segment_to_quad",
    "orient_ccw",
    "DEG_TO_M",
    "get_direction",
    "name_the_direction",
    "gps_to_img_coords",
]
