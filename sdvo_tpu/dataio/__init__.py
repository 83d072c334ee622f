from sdvo_tpu.dataio.datasets import (  # noqa: F401
    list_image_files,
    load_image_grayscale,
    load_kitti_calib,
    load_camera_yaml,
)
from sdvo_tpu.dataio.poses import write_kitti_poses, read_kitti_poses  # noqa: F401
from sdvo_tpu.dataio.evaluate import ate_rmse, rpe, umeyama_alignment  # noqa: F401
