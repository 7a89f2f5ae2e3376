"""Import reference PyTorch checkpoints into flax parameter trees.

The reference saves plain ``state_dict()`` files
(reference: src/train_utils/supervised_train.py, pretrain.py via
``torch.save(model.state_dict(), ...)``) and loads them by key intersection
(reference: src/general_utils/weight_utils.py:9-25). This module is the
migration bridge in the other direction: it maps a reference-trained
DeepSense ``.pt`` state_dict onto this framework's flax params/batch_stats so
reference-pretrained backbones can be finetuned or evaluated here.

Layout conversions handled:
  - Conv2d  [out, in, kh, kw]  ->  flax NHWC kernel [kh, kw, in, out]
  - the ConvBlock output Conv1d flattens torch [b, c, s, i] channel-major
    (index c*S + s; reference: ConvModules.py:208-216) while the flax block
    flattens NHWC spectrum-major (index s*C + c) — rows are permuted to match
  - torch nn.GRU per-direction weight_ih/hh_l{k}(_reverse) [3H, in] ->
    BiGRULayer stacked [2, in, 3H] (gate order r, z, n is identical)
  - nn.Linear [out, in] -> Dense kernel [in, out]

Use ``load_torch_state_dict`` for a ``.pt`` file, then
``import_deepsense_state_dict`` to produce new (params, batch_stats).
"""

import copy
from collections.abc import Mapping

import numpy as np


def _np(v):
    """torch tensor / array -> numpy array."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def load_torch_state_dict(path):
    """Load a reference ``.pt`` checkpoint into a {name: numpy} dict."""
    import torch

    obj = torch.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: _np(v) for k, v in obj.items()}


def _set(dst, key, value):
    """Shape-checked, dtype-preserving assignment into a param subtree."""
    old = dst[key]
    value = np.asarray(value)
    if tuple(np.shape(old)) != value.shape:
        raise ValueError(
            f"Shape mismatch importing '{key}': checkpoint {value.shape}, model {np.shape(old)}"
        )
    dst[key] = value.astype(np.asarray(old).dtype)


def _conv_layer(sd, pt, layer_params, layer_stats):
    w = _np(sd[pt + "conv.weight"])  # [out, in, kh, kw]
    _set(layer_params["Conv_0"], "kernel", w.transpose(2, 3, 1, 0))
    _set(layer_params["Conv_0"], "bias", _np(sd[pt + "conv.bias"]))
    _set(layer_params["BatchNorm_0"], "scale", _np(sd[pt + "batch_norm.weight"]))
    _set(layer_params["BatchNorm_0"], "bias", _np(sd[pt + "batch_norm.bias"]))
    _set(layer_stats["BatchNorm_0"], "mean", _np(sd[pt + "batch_norm.running_mean"]))
    _set(layer_stats["BatchNorm_0"], "var", _np(sd[pt + "batch_norm.running_var"]))


def _out_proj_rows(in_total, half_channels, fuse_time, interval_num):
    """Row permutation mapping flax flatten order onto torch flatten order.

    Non-fused: flax row s*C + c  <- torch row c*S + s
    Fused:     flax row i*S*C + s*C + c  <- torch row c*S*I + s*I + i
    (reference: ConvModules.py:208-216)."""
    C = half_channels
    if fuse_time:
        I = interval_num
        S = in_total // (C * I)
        f = np.arange(in_total)
        i, rest = f // (S * C), f % (S * C)
        s, c = rest // C, rest % C
        return c * S * I + s * I + i
    S = in_total // C
    f = np.arange(in_total)
    s, c = f // C, f % C
    return c * S + s


def _conv_block(sd, pt, block_params, block_stats, fuse_time, interval_num):
    _conv_layer(sd, pt + "conv_layer_in.", block_params["ConvLayer2D_0"], block_stats["ConvLayer2D_0"])
    i = 0
    while pt + f"conv_layers_inter.{i}.conv.weight" in sd:
        _conv_layer(
            sd,
            pt + f"conv_layers_inter.{i}.",
            block_params[f"ConvLayer2D_{i + 1}"],
            block_stats[f"ConvLayer2D_{i + 1}"],
        )
        i += 1
    wout = _np(sd[pt + "conv_layer_out.weight"])[:, :, 0]  # [out, in_total]
    half = _np(sd[pt + "conv_layer_in.conv.weight"]).shape[0]
    rows = _out_proj_rows(wout.shape[1], half, fuse_time, interval_num)
    _set(block_params["out_proj"], "kernel", wout.T[rows])
    _set(block_params["out_proj"], "bias", _np(sd[pt + "conv_layer_out.bias"]))


def _gru(sd, pt, dst):
    layer = 0
    while f"{pt}weight_ih_l{layer}" in sd:
        g = dst[f"gru{layer}"]
        _set(g, "wi", np.stack([
            _np(sd[f"{pt}weight_ih_l{layer}"]).T,
            _np(sd[f"{pt}weight_ih_l{layer}_reverse"]).T,
        ]))
        _set(g, "wh", np.stack([
            _np(sd[f"{pt}weight_hh_l{layer}"]).T,
            _np(sd[f"{pt}weight_hh_l{layer}_reverse"]).T,
        ]))
        _set(g, "bi", np.stack([
            _np(sd[f"{pt}bias_ih_l{layer}"]),
            _np(sd[f"{pt}bias_ih_l{layer}_reverse"]),
        ]))
        _set(g, "bh", np.stack([
            _np(sd[f"{pt}bias_hh_l{layer}"]),
            _np(sd[f"{pt}bias_hh_l{layer}_reverse"]),
        ]))
        layer += 1


def _linear(sd, pt, dst):
    _set(dst, "kernel", _np(sd[pt + "weight"]).T)
    if pt + "bias" in sd:
        _set(dst, "bias", _np(sd[pt + "bias"]))


def _plain(tree):
    """FrozenDict / dict pytree -> mutable nested dict copy."""
    if isinstance(tree, Mapping):
        return {k: _plain(v) for k, v in tree.items()}
    return copy.copy(tree)


def import_deepsense_state_dict(sd, variables, dataset_config, interval_num=None,
                                load_class_layer=True):
    """Map a reference torch DeepSense state_dict into (params, batch_stats).

    ``variables`` is the flax init result ({"params": ..., "batch_stats": ...})
    of this framework's DeepSense built from the same ``dataset_config``;
    the shapes act as the schema check. Missing keys raise KeyError, shape
    mismatches ValueError. ``load_class_layer=False`` mirrors the reference
    finetune loading rule (weight_utils.py:18-21)."""
    config = dataset_config["DeepSense"]
    mods = dataset_config["modality_names"]
    locs = dataset_config["location_names"]
    params = _plain(variables["params"])
    stats = _plain(variables.get("batch_stats", {}))
    interval_num = interval_num or dataset_config.get("num_segments", 9)

    def conv_lens_for(mod):
        cl = config["loc_mod_conv_lens"]
        return cl[mod] if isinstance(cl, Mapping) else cl

    for loc in locs:
        for mod in mods:
            fuse = conv_lens_for(mod)[1][0] > 1
            _conv_block(
                sd, f"loc_mod_extractors.{loc}.{mod}.",
                params[f"loc_mod_extractor_{loc}_{mod}"],
                stats[f"loc_mod_extractor_{loc}_{mod}"],
                fuse, interval_num,
            )
    if len(locs) > 1:
        for mod in mods:
            fuse = config["loc_conv_lens"][1][0] > 1
            _conv_block(
                sd, f"mod_extractors.{mod}.",
                params[f"mod_extractor_{mod}"], stats[f"mod_extractor_{mod}"],
                fuse, interval_num,
            )
    for mod in mods:
        _gru(sd, f"recurrent_layers.{mod}.gru.", params[f"recurrent_{mod}"])
        _linear(sd, f"mod_projectors.{mod}.0.", params[f"mod_projector_{mod}"]["Dense_0"])
        _linear(sd, f"mod_projectors.{mod}.2.", params[f"mod_projector_{mod}"]["Dense_1"])
    if load_class_layer and "class_layer.0.weight" in sd:
        _linear(sd, "class_layer.0.", params["class_layer"]["Dense_0"])
        if "class_layer.2.weight" in sd:
            _linear(sd, "class_layer.2.", params["class_layer"]["Dense_1"])
    return params, stats
