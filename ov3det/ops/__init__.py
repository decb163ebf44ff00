from ov3det.ops.pointcloud import (
    ball_group,
    ball_group_auto,
    ball_query,
    bucket_picks,
    furthest_point_sample,
    gather_points,
    group_points,
)
from ov3det.ops.hungarian import auction_lap

__all__ = [
    "ball_group",
    "ball_group_auto",
    "bucket_picks",
    "ball_query",
    "furthest_point_sample",
    "gather_points",
    "group_points",
    "auction_lap",
]
