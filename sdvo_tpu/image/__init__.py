from sdvo_tpu.image.pyramid import ImagePyramid, build_pyramid, abs_gradient_saturated_sum, pyr_down  # noqa: F401
from sdvo_tpu.image.interp import bilinear_sample, extract_patches  # noqa: F401
