from pointnav_vo_tpu.ops import geometry, depth, topdown  # noqa: F401
