from ov3det.ops.pointcloud import (
    ball_group,
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
)
from ov3det.ops.hungarian import auction_lap

__all__ = [
    "ball_group",
    "ball_query",
    "furthest_point_sample",
    "gather_points",
    "group_points",
    "auction_lap",
]
