"""Ray Data stages: batch transforms, actor-pool joins, rasterization."""
