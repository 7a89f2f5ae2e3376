from focal_tpu.ops.fft import fft_preprocess  # noqa: F401
from focal_tpu.ops.augment import build_augmenter  # noqa: F401
