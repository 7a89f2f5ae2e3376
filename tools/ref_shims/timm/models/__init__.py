from timm.models import layers  # noqa: F401
