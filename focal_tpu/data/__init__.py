from focal_tpu.data.dataset import ArrayDataset  # noqa: F401
from focal_tpu.data.loader import create_dataloader  # noqa: F401
