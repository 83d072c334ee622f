from sdvo_tpu.mapping.arena import MapArena, PointType  # noqa: F401
from sdvo_tpu.mapping.reproject import reproject_map, project_points  # noqa: F401
