"""Import-only stubs: the parity recipe excludes warp augmenters."""


def _unavailable(*_a, **_k):
    raise RuntimeError(
        "tsai is not installed; the parity recipe must exclude "
        "time_warp/mag_warp from the augmenter pool"
    )


class TSTimeWarp:
    def __init__(self, *a, **k):
        _unavailable()


class TSMagWarp:
    def __init__(self, *a, **k):
        _unavailable()
