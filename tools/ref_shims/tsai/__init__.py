"""tsai import stub: the reference imports TSTimeWarp/TSMagWarp at module
load (src/data_augmenter/{TimeWarp,MagWarp}Augmenter.py). tsai is not
installed; the parity recipe excludes both warp augmenters from the pool,
so these symbols must import but must never run."""
