"""Import-only stub (see transforms.py)."""


class TSTensor:
    def __init__(self, *a, **k):
        raise RuntimeError("tsai is not installed (parity recipe excludes warps)")
