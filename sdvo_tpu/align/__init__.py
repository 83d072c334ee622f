from sdvo_tpu.align.image_alignment import SparseImageAlign, AlignFeatures  # noqa: F401
from sdvo_tpu.align.feature_alignment import align_features_2d  # noqa: F401
