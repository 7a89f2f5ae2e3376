from focal_tpu.models.registry import build_backbone  # noqa: F401
