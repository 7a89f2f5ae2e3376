from focal_tpu.params.cli import parse_train_params, parse_test_params  # noqa: F401
from focal_tpu.params.auto import set_auto_params, get_train_mode  # noqa: F401
