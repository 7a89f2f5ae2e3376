"""On-device augmentation engine.

The reference applies augmenters as eager torch modules per batch inside the
training loop (reference: src/data_augmenter/Augmenter.py:24-227 and the 13
modules next to it). Here every augmenter is a pure jittable function over a
``{loc: {mod: [b,c,i,s]}}`` pytree with explicit PRNG keys, so augmentation,
FFT, model, loss and optimizer fuse into one XLA program.

Semantics parity notes:
  * decisions are per-(loc, mod) per batch, via one Bernoulli(p) draw each —
    not per sample — matching the reference's ``random() < self.p`` pattern;
  * the "random" pipeline draws ONE augmenter uniformly from the combined
    time+freq pool and applies it in its domain (Augmenter.py:76-113),
    implemented with ``lax.switch`` so the choice stays on device;
  * gated branches are computed unconditionally and selected with
    ``jnp.where`` — cheap for these memory-bound ops and jit-stable;
  * the "fixed" pipeline discards mixup's soft labels exactly like the
    reference (Augmenter.py:68) unless ``mixup_labels`` is set;
  * time_warp/mag_warp reproduce tsai's smooth random-curve transforms
    distributionally (random knots ~ N(1, magnitude) interpolated over the
    flattened time axis) rather than bit-exactly;
  * time_mask zeroes a random run of *intervals* (axis 2) — the documented
    intent; the reference indexes axis 3 with interval-derived bounds
    (TimeMaskAugmenter.py:41-43), an apparent slip in dead code (time_mask is
    in no shipped pool).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from focal_tpu.ops.fft import fft_preprocess

# Per-dataset max-abs value ranges used to scale jitter noise
# (reference: src/input_utils/normalize.py:1-12).
ALL_VALUE_RANGES = {
    "MOD": {
        "time": {"audio": 44778.1953125, "seismic": 71805.0},
        "frequency": {"audio": 1023106.0, "seismic": 14450094.0},
    },
}


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _bernoulli(key, p):
    return jax.random.uniform(key) < p


def _gated(key, p, x, aug_fn):
    """Apply aug_fn(key, x) with probability p (single draw for the batch)."""
    kgate, kaug = jax.random.split(key)
    return jnp.where(_bernoulli(kgate, p), aug_fn(kaug, x), x)


def _linear_interp_time(x, positions):
    """Linearly sample x [b, c, L] at float positions [L]."""
    L = x.shape[-1]
    pos = jnp.clip(positions, 0.0, L - 1.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, L - 1)
    frac = pos - i0
    return x[..., i0] * (1.0 - frac) + x[..., i1] * frac


def _random_curve(key, length, magnitude, order):
    """Smooth random curve ~ N(1, magnitude): knots linearly interpolated
    over `length` points (distributional port of tsai's spline curve)."""
    n_knots = 3 * (max(order, 2) - 1) + 1
    knots = 1.0 + magnitude * jax.random.normal(key, (n_knots,))
    knot_pos = jnp.linspace(0.0, length - 1.0, n_knots)
    return jnp.interp(jnp.arange(length, dtype=jnp.float32), knot_pos, knots)


def _range_mask(length, start, width):
    """Boolean [length] mask, True inside [start, start+width)."""
    idx = jnp.arange(length)
    return (idx >= start) & (idx < start + width)


# --------------------------------------------------------------------------
# single-modality augmenters: fn(key, x[b,c,i,s], cfg, ctx) -> x
# ctx carries static per-mod values (noise std, mask bounds, ...)
# --------------------------------------------------------------------------


def aug_no(key, x, cfg, ctx):
    return x


def aug_permutation(key, x, cfg, ctx):
    """Permute the interval axis, same order for the whole batch
    (reference: PermutationAugmenter.py:33-37)."""

    def _apply(k, v):
        perm = jax.random.permutation(k, v.shape[2])
        return v[:, :, perm, :]

    return _gated(key, cfg["prob"], x, _apply)


def aug_scaling(key, x, cfg, ctx):
    """One N(1, std) scale per (loc, mod) (reference: ScalingAugmenter.py:34-37)."""

    def _apply(k, v):
        return v * (1.0 + cfg["std"] * jax.random.normal(k))

    return _gated(key, cfg["prob"], x, _apply)


def aug_negation(key, x, cfg, ctx):
    return _gated(key, cfg["prob"], x, lambda k, v: -v)


def aug_horizontal_flip(key, x, cfg, ctx):
    """Flip interval + sample axes (reference: HorizontalFlipAugmenter.py:35)."""
    return _gated(key, cfg["prob"], x, lambda k, v: jnp.flip(v, axis=(2, 3)))


def aug_channel_shuffle(key, x, cfg, ctx):
    def _apply(k, v):
        perm = jax.random.permutation(k, v.shape[1])
        return v[:, perm, :, :]

    return _gated(key, cfg["prob"], x, _apply)


def aug_jitter(key, x, cfg, ctx):
    """Additive Gaussian noise scaled by the modality's value range
    (reference: JitterAugmenter.py:38-41,51-57)."""
    std = ctx["jitter_std"]

    def _apply(k, v):
        return v + std * jax.random.normal(k, v.shape, dtype=v.dtype)

    return _gated(key, cfg["prob"], x, _apply)


def aug_time_warp(key, x, cfg, ctx):
    """Smooth random time warping over the flattened [i*s] axis
    (reference: TimeWarpAugmenter.py:41-45 via tsai TSTimeWarp)."""

    def _apply(k, v):
        b, c, i, s = v.shape
        L = i * s
        curve = _random_curve(k, L, cfg["magnitude"], cfg["order"])
        cum = jnp.cumsum(curve)
        cum = (cum - cum[0]) / jnp.maximum(cum[-1] - cum[0], 1e-8)
        positions = jnp.clip(cum, 0.0, 1.0) * (L - 1)
        flat = v.reshape(b, c, L)
        return _linear_interp_time(flat, positions).reshape(b, c, i, s)

    return _gated(key, cfg["prob"], x, _apply)


def aug_mag_warp(key, x, cfg, ctx):
    """Smooth random magnitude envelope (reference: MagWarpAugmenter.py:41-45)."""

    def _apply(k, v):
        b, c, i, s = v.shape
        curve = _random_curve(k, i * s, cfg["magnitude"], cfg["order"])
        return (v.reshape(b, c, i * s) * curve).reshape(b, c, i, s)

    return _gated(key, cfg["prob"], x, _apply)


def aug_time_mask(key, x, cfg, ctx):
    """Zero a random contiguous run of intervals, duration <= num_segments *
    mask_ratio (intended semantics of TimeMaskAugmenter.py:38-44)."""
    max_duration = ctx["time_mask_max"]

    def _apply(k, v):
        kd, ks = jax.random.split(k)
        duration = jax.random.randint(kd, (), 1, max_duration + 1)
        start = jax.random.randint(ks, (), 0, v.shape[2] - duration + 1)
        mask = _range_mask(v.shape[2], start, duration)
        return jnp.where(mask[None, None, :, None], 0.0, v)

    return _gated(key, cfg["prob"], x, _apply)


def aug_freq_mask(key, x, cfg, ctx):
    """Zero a random frequency band (reference: FreqMaskAugmenter.py:44-49)."""
    max_band = ctx["freq_mask_max"]

    def _apply(k, v):
        kw, ks = jax.random.split(k)
        width = jax.random.randint(kw, (), 1, max_band + 1)
        start = jax.random.randint(ks, (), 0, v.shape[3] - width + 1)
        mask = _range_mask(v.shape[3], start, width)
        return jnp.where(mask[None, None, None, :], 0.0, v)

    return _gated(key, cfg["prob"], x, _apply)


def aug_phase_shift(key, x, cfg, ctx):
    """Rotate the complex spectrum by one uniform angle in (-pi, pi).

    Operates on the interleaved freq layout [b, 2c, i, s] with channel pairs
    (re, im) adjacent (reference: PhaseShiftAugmenter.py:36-58). Implemented
    as a direct complex rotation — mathematically identical to the
    reference's abs/angle/cos/sin round-trip, minus the atan2.
    """

    def _apply(k, v):
        theta = (jax.random.uniform(k) - 0.5) * 2.0 * jnp.pi
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        re, im = v[:, 0::2], v[:, 1::2]
        new_re = re * cos_t - im * sin_t
        new_im = re * sin_t + im * cos_t
        b, c, i, s = re.shape
        return jnp.stack([new_re, new_im], axis=2).reshape(b, 2 * c, i, s)

    return _gated(key, cfg["prob"], x, _apply)


TIME_AUGMENTERS = {
    "no": aug_no,
    "permutation": aug_permutation,
    "scaling": aug_scaling,
    "negation": aug_negation,
    "horizontal_flip": aug_horizontal_flip,
    "channel_shuffle": aug_channel_shuffle,
    "jitter": aug_jitter,
    "time_warp": aug_time_warp,
    "mag_warp": aug_mag_warp,
    "time_mask": aug_time_mask,
    "mixup": None,  # handled at the pipeline level (cross-modality state)
}

FREQ_AUGMENTERS = {
    "no": aug_no,
    "freq_mask": aug_freq_mask,
    "phase_shift": aug_phase_shift,
}


# --------------------------------------------------------------------------
# mixup / cutmix (cross-modality: shared lam + permutation)
# --------------------------------------------------------------------------


def mixup_batch(key, loc_inputs, labels, cfg, num_classes):
    """timm-style Mixup/CutMix, 'random_batch' (default) or 'batch' mode
    (reference: src/input_utils/mixup_utils.py:231-279).

    One (lam, use_cutmix, rand_index) triple per batch shared by all
    (loc, mod); cutmix draws an independent bbox per modality. 'batch' mode
    mixes against the flipped batch instead of a random permutation
    (mixup_utils.py:231-251). The reference's 'elem'/'pair' modes crash on
    dict inputs (SURVEY §2.2) and are not reproduced. Returns the mixed
    inputs and soft one-hot labels.
    """
    k_apply, k_switch, k_lam_mix, k_lam_cut, k_perm, k_bbox = jax.random.split(key, 6)
    b = labels.shape[0]
    mode = cfg.get("mode", "random_batch")
    if mode not in ("random_batch", "batch"):
        raise ValueError(f"Unsupported mixup mode: {mode} (reference 'elem'/'pair' crash on dicts)")

    apply_mix = _bernoulli(k_apply, cfg["prob"])
    use_cutmix = _bernoulli(k_switch, cfg["switch_prob"]) & (cfg.get("cutmix_alpha", 0) > 0)
    lam_mix = jax.random.beta(k_lam_mix, cfg["mixup_alpha"], cfg["mixup_alpha"])
    lam_cut = jax.random.beta(k_lam_cut, cfg["cutmix_alpha"], cfg["cutmix_alpha"]) if cfg.get("cutmix_alpha", 0) > 0 else lam_mix
    lam = jnp.where(apply_mix, jnp.where(use_cutmix, lam_cut, lam_mix), 1.0)
    if mode == "batch":
        rand_index = jnp.arange(b)[::-1]  # mix against the flipped batch
    else:
        rand_index = jax.random.permutation(k_perm, b)

    out = {}
    for li, (loc, mods) in enumerate(loc_inputs.items()):
        out[loc] = {}
        for mi, (mod, x) in enumerate(mods.items()):
            kb = jax.random.fold_in(k_bbox, li * 131 + mi)
            ky, kx = jax.random.split(kb)
            i_dim, s_dim = x.shape[2], x.shape[3]
            # cutmix bbox (reference: mixup_utils.py:31-53, margin=0)
            ratio = jnp.sqrt(jnp.maximum(1.0 - lam, 0.0))
            cut_h = (i_dim * ratio).astype(jnp.int32)
            cut_w = (s_dim * ratio).astype(jnp.int32)
            cy = jax.random.randint(ky, (), 0, i_dim)
            cx = jax.random.randint(kx, (), 0, s_dim)
            yl, yh = jnp.clip(cy - cut_h // 2, 0, i_dim), jnp.clip(cy + cut_h // 2, 0, i_dim)
            xl, xh = jnp.clip(cx - cut_w // 2, 0, s_dim), jnp.clip(cx + cut_w // 2, 0, s_dim)
            row = jnp.arange(i_dim)
            col = jnp.arange(s_dim)
            bbox = ((row >= yl) & (row < yh))[:, None] & ((col >= xl) & (col < xh))[None, :]

            mixed = lam * x + (1.0 - lam) * x[rand_index]
            cutmixed = jnp.where(bbox[None, None], x[rand_index], x)
            aug = jnp.where(apply_mix, jnp.where(use_cutmix, cutmixed, mixed), x)
            out[loc][mod] = aug

    # soft targets (reference: mixup_utils.py:22-28)
    smoothing = cfg.get("label_smoothing", 0.0)
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    y1 = jax.nn.one_hot(labels, num_classes) * (on - off) + off
    y2 = jax.nn.one_hot(labels[rand_index], num_classes) * (on - off) + off
    soft = y1 * lam + y2 * (1.0 - lam)
    return out, soft


# --------------------------------------------------------------------------
# pipeline builder
# --------------------------------------------------------------------------


class Augmenter:
    """Static augmentation pipeline compiled from the dataset recipe.

    Exposes three pure functions usable inside jit:
      fixed(key, time_x, labels)  -> (freq_x, labels)   [supervised]
      random(key, time_x)         -> freq_x             [pretrain views]
      no(time_x)                  -> freq_x             [eval/finetune]
    """

    def __init__(self, args):
        cfgs = args.dataset_config
        self.dataset = args.dataset
        self.modalities = cfgs["modality_names"]
        self.locations = cfgs["location_names"]
        self.num_classes = cfgs[args.task]["num_classes"]
        self.mixup_labels = bool(getattr(args, "mixup_labels", False))

        # pools (reference: Augmenter.py:193-227)
        if args.train_mode != "supervised" and args.stage == "pretrain":
            pool_cfg = cfgs[args.learn_framework]["random_augmenters"]
        else:
            pool_cfg = cfgs[args.model]["fixed_augmenters"]
        self.time_aug_names = list(pool_cfg["time_augmenters"])
        self.freq_aug_names = list(pool_cfg["freq_augmenters"])
        for name in self.time_aug_names:
            if name not in TIME_AUGMENTERS:
                raise ValueError(f"Invalid time augmenter: {name}")
        for name in self.freq_aug_names:
            if name not in FREQ_AUGMENTERS:
                raise ValueError(f"Invalid freq augmenter: {name}")
        if args.stage == "pretrain" and args.train_mode != "supervised" and "mixup" in self.time_aug_names:
            raise ValueError("mixup is label-dependent and not supported in the random (pretrain) pool")

        self.aug_cfgs = {
            name: cfgs.get(name, {}) for name in set(self.time_aug_names + self.freq_aug_names)
        }

        # static per-mod context
        self.ctx = {}
        for loc in self.locations:
            for mod in cfgs["loc_modalities"][loc]:
                if mod not in cfgs["loc_mod_spectrum_len"][loc]:
                    continue
                spectrum_len = cfgs["loc_mod_spectrum_len"][loc][mod]
                ctx = {
                    "time_mask_max": max(
                        1, math.floor(cfgs["num_segments"] * cfgs.get("time_mask", {}).get("mask_ratio", 0.3))
                    ),
                    "freq_mask_max": max(
                        1, math.floor(spectrum_len * cfgs.get("freq_mask", {}).get("mask_ratio", 0.3))
                    ),
                }
                ranges = ALL_VALUE_RANGES.get(self.dataset, {}).get("time", {})
                jitter_cfg = cfgs.get("jitter", {})
                ctx["jitter_std"] = (
                    ranges.get(mod, 1.0) / 100.0 * jitter_cfg.get("std_in_percent", 0.2)
                )
                self.ctx[(loc, mod)] = ctx

    # -- application helpers ------------------------------------------------

    def _apply_one(self, name, domain, key, loc_inputs):
        """Apply one named augmenter across all (loc, mod)."""
        table = TIME_AUGMENTERS if domain == "time" else FREQ_AUGMENTERS
        fn = table[name]
        cfg = self.aug_cfgs[name]
        out = {}
        for li, loc in enumerate(loc_inputs):
            out[loc] = {}
            for mi, (mod, x) in enumerate(loc_inputs[loc].items()):
                k = jax.random.fold_in(key, li * 131 + mi)
                out[loc][mod] = fn(k, x, cfg, self.ctx[(loc, mod)])
        return out

    # -- pipelines ------------------------------------------------------------

    def fixed(self, key, time_loc_inputs, labels):
        """All time augs -> FFT -> all freq augs (reference: Augmenter.py:52-74).

        Returns (freq_x, labels) where labels are the ORIGINAL hard labels
        unless mixup_labels is set (reference quirk at Augmenter.py:68:
        mixup's soft labels are discarded before the freq stage).
        """
        x = time_loc_inputs
        soft_labels = None
        for ai, name in enumerate(self.time_aug_names):
            k = jax.random.fold_in(key, ai)
            if name == "mixup":
                x, soft_labels = mixup_batch(
                    k, x, labels, self.aug_cfgs["mixup"], self.num_classes
                )
            else:
                x = self._apply_one(name, "time", k, x)

        x = fft_preprocess(x)

        for ai, name in enumerate(self.freq_aug_names):
            k = jax.random.fold_in(key, 1000 + ai)
            x = self._apply_one(name, "freq", k, x)

        if self.mixup_labels and soft_labels is not None:
            return x, soft_labels
        return x, labels

    def _gate_bits(self, name, key, loc_inputs):
        """The per-(loc, mod) applied/not-applied gate draws the named
        augmenter makes, recomputed from the SAME key derivation `_apply_one`
        + `_gated` use (fold_in(key, li*131+mi) then the first split), so the
        labels exactly describe what happened to the data. 'no' never
        perturbs -> zeros."""
        cfg = self.aug_cfgs[name]
        p = cfg.get("prob", 1.0)
        bits = []
        # SORTED (loc, mod) enumeration: lax.switch flattens its dict operand
        # into pytree-canonical (sorted-key) order, so _apply_one inside the
        # branch sees sorted dicts — the gate recomputation must fold_in the
        # same (li, mi) indices. Sorting here makes eager calls match too.
        for li, loc in enumerate(sorted(loc_inputs)):
            for mi, _mod in enumerate(sorted(loc_inputs[loc])):
                if name == "no":
                    bits.append(jnp.zeros((), bool))
                    continue
                kgate, _ = jax.random.split(jax.random.fold_in(key, li * 131 + mi))
                bits.append(_bernoulli(kgate, p))
        return jnp.stack(bits)

    def random(self, key, time_loc_inputs, return_aug_id=False, return_aug_mods=False,
               force_aug_id=None):
        """One random augmenter from the combined pool, in its domain
        (reference: Augmenter.py:76-113), selected on device via lax.switch.
        With return_aug_id, also returns the per-sample augmenter-id labels
        (reference: Augmenter.py:103-106) for aug-prediction pretext tasks.
        With return_aug_mods, instead returns [B, n_loc*n_mod] float labels
        marking which (loc, mod) inputs the chosen augmenter actually
        perturbed (reference: Augmenter.py:107-108 + the aug_mod_labels each
        augmenter builds, e.g. JitterAugmenter.py:27-47). Column order is
        SORTED (loc, mod) — the jax pytree-canonical dict order, which is
        the order the switch branches enumerate.

        force_aug_id overrides the on-device selection with an externally
        drawn augmenter index (traced int in [0, n_time+n_freq)) — the
        -py_aug_draws attribution arm feeds host Python-random draws here;
        the augmenter's internal randomness still comes from ``key``."""
        k_sel, k_aug = jax.random.split(key)
        n_time = len(self.time_aug_names)
        n_freq = len(self.freq_aug_names)
        if force_aug_id is None:
            aug_id = jax.random.randint(k_sel, (), 0, n_time + n_freq)
        else:
            aug_id = jnp.asarray(force_aug_id, jnp.int32)

        # time stage: branch per time augmenter + identity (freq aug chosen)
        time_branches = [
            partial(self._apply_one, name, "time") for name in self.time_aug_names
        ] + [lambda key, x: x]
        time_idx = jnp.where(aug_id < n_time, aug_id, n_time)
        x = jax.lax.switch(time_idx, time_branches, k_aug, time_loc_inputs)

        x = fft_preprocess(x)

        freq_branches = [
            partial(self._apply_one, name, "freq") for name in self.freq_aug_names
        ] + [lambda key, x: x]
        freq_idx = jnp.where(aug_id >= n_time, aug_id - n_time, n_freq)
        out = jax.lax.switch(freq_idx, freq_branches, k_aug, x)
        if return_aug_id:
            loc0 = self.locations[0]
            b = time_loc_inputs[loc0][next(iter(time_loc_inputs[loc0]))].shape[0]
            return out, jnp.full((b,), aug_id, jnp.int32)
        if return_aug_mods:
            # gate-bit rows for every pool entry (scalar draws — cheap), the
            # applied row selected by aug_id and tiled over the batch
            all_bits = jnp.stack([
                self._gate_bits(name, k_aug, time_loc_inputs)
                for name in self.time_aug_names + self.freq_aug_names
            ])
            loc0 = self.locations[0]
            b = time_loc_inputs[loc0][next(iter(time_loc_inputs[loc0]))].shape[0]
            mod_labels = jnp.tile(all_bits[aug_id].astype(jnp.float32)[None, :], (b, 1))
            return out, mod_labels
        return out

    def no(self, time_loc_inputs):
        """FFT only (reference: Augmenter.py:115-126)."""
        return fft_preprocess(time_loc_inputs)


def build_augmenter(args):
    return Augmenter(args)
