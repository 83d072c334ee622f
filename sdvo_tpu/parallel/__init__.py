from sdvo_tpu.parallel.mesh import make_vo_mesh  # noqa: F401
from sdvo_tpu.parallel.batched_vo import batched_align_step  # noqa: F401
from sdvo_tpu.parallel.dist_ba import distributed_local_ba, shard_observations  # noqa: F401
from sdvo_tpu.parallel.dist_ba import ba_with_pose_graph_refine  # noqa: F401
from sdvo_tpu.parallel.pose_graph import (  # noqa: F401
    PoseGraphEdges,
    distributed_pose_graph,
    optimize_pose_graph,
)
