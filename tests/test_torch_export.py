"""Torch-checkpoint export: flax params -> reference torch state_dict.

The migration bridge in the forward direction (torch_export.py): backbones
pretrained HERE must load into the reference stack with
``load_state_dict(strict=True)`` — including the registered geometry
buffers — and produce the same forward outputs (reference:
src/models/DeepSense.py:11-167, SW_Transformer.py:17-182, SwinModules.py).
Round-trip export->import must be the identity on the param tree.
"""

import os

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


def _fixed_batch(cfg, b=3):
    rng = np.random.default_rng(11)
    out = {}
    for loc in cfg["location_names"]:
        out[loc] = {}
        for mod in cfg["modality_names"]:
            c = cfg["loc_mod_in_freq_channels"][loc][mod]
            s = cfg["loc_mod_spectrum_len"][loc][mod]
            i = cfg["num_segments"]
            out[loc][mod] = rng.normal(size=(b, c, i, s)).astype(np.float32)
    return out


def _to_torch(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}


def _forward_parity(model, variables, tm, cfg, batch):
    jx = {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in batch.items()}
    got = np.asarray(model.apply(variables, jx, train=False, head="class"))
    with torch.no_grad():
        tx = {loc: {m: torch.from_numpy(a) for m, a in mods.items()} for loc, mods in batch.items()}
        want = tm(tx, class_head=True).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
    got_proj = model.apply(variables, jx, train=False, head="proj")
    with torch.no_grad():
        want_proj = tm(tx, class_head=False, proj_head=True)
    for mod in cfg["modality_names"]:
        np.testing.assert_allclose(
            np.asarray(got_proj[mod]), want_proj[mod].numpy(), atol=1e-4
        )


def test_deepsense_export_strict_load_and_forward_parity():
    from focal_tpu.models.deepsense import DeepSense
    from focal_tpu.params.yaml_utils import load_dataset_config
    from focal_tpu.utils.reference_loader import import_reference
    from focal_tpu.utils.torch_export import export_deepsense_state_dict

    cfg = load_dataset_config("MOD_TINY")
    model = DeepSense(dataset_config=cfg, task="vehicle_classification", linear_class_head=True)
    batch = _fixed_batch(cfg)
    jx = {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in batch.items()}
    variables = model.init(
        {"params": jax.random.key(3), "dropout": jax.random.key(4)}, jx, train=False, head="both"
    )
    sd = export_deepsense_state_dict(variables["params"], variables["batch_stats"], cfg)

    TorchDeepSense = import_reference("models.DeepSense").DeepSense
    args = SimpleNamespace(
        dataset_config=cfg, device="cpu", task="vehicle_classification", train_mode="supervised"
    )
    torch.manual_seed(1)
    tm = TorchDeepSense(args)
    # key-set equality first: a missing or extra key is a schema bug even
    # when strict load would name it
    assert set(sd) == set(tm.state_dict().keys())
    tm.load_state_dict(_to_torch(sd), strict=True)
    tm.eval()
    _forward_parity(model, variables, tm, cfg, batch)


def test_sw_transformer_export_strict_load_and_forward_parity():
    from focal_tpu.models.sw_transformer import SWTransformer
    from focal_tpu.params.yaml_utils import load_dataset_config
    from focal_tpu.utils.reference_loader import import_reference
    from focal_tpu.utils.torch_export import export_sw_transformer_state_dict

    cfg = dict(load_dataset_config("MOD_TINY"))
    # the reference hard-codes timm's mlp_ratio=4 (SwinModules.py:200)
    cfg["SW_Transformer"] = dict(cfg["SW_Transformer"], mlp_ratio=4.0)
    model = SWTransformer(dataset_config=cfg, task="vehicle_classification", linear_class_head=True)
    batch = _fixed_batch(cfg)
    jx = {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in batch.items()}
    variables = model.init(
        {"params": jax.random.key(5), "dropout": jax.random.key(6)}, jx, train=False, head="both"
    )
    sd = export_sw_transformer_state_dict(variables["params"], cfg)

    TorchSW = import_reference("models.SW_Transformer").SW_Transformer
    args = SimpleNamespace(
        dataset_config=cfg, device="cpu", task="vehicle_classification", train_mode="supervised"
    )
    torch.manual_seed(1)
    tm = TorchSW(args)
    assert set(sd) == set(tm.state_dict().keys())
    tm.load_state_dict(_to_torch(sd), strict=True)
    tm.eval()
    _forward_parity(model, {"params": variables["params"]}, tm, cfg, batch)


def test_roundtrip_export_import_identity():
    """export -> import must reproduce the flax tree bit-exactly (f32):
    every layout conversion has a consistent inverse."""
    from focal_tpu.models.deepsense import DeepSense
    from focal_tpu.params.yaml_utils import load_dataset_config
    from focal_tpu.utils.torch_export import export_deepsense_state_dict
    from focal_tpu.utils.torch_import import import_deepsense_state_dict

    cfg = load_dataset_config("MOD_TINY")
    model = DeepSense(dataset_config=cfg, task="vehicle_classification", linear_class_head=True)
    batch = _fixed_batch(cfg, b=1)
    jx = {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in batch.items()}
    variables = model.init(
        {"params": jax.random.key(8), "dropout": jax.random.key(9)}, jx, train=False, head="both"
    )
    sd = export_deepsense_state_dict(variables["params"], variables["batch_stats"], cfg)
    params, stats = import_deepsense_state_dict(sd, variables, cfg)

    flat0, _ = jax.tree_util.tree_flatten_with_path(variables["params"])
    flat1, _ = jax.tree_util.tree_flatten_with_path(params)
    assert len(flat0) == len(flat1)
    for (p0, v0), (p1, v1) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1), err_msg=str(p0))
    for (p0, v0), (p1, v1) in zip(
        jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0],
        jax.tree_util.tree_flatten_with_path(stats)[0],
    ):
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1), err_msg=str(p0))


def test_save_torch_state_dict_roundtrip(tmp_path):
    from focal_tpu.utils.torch_export import save_torch_state_dict
    from focal_tpu.utils.torch_import import load_torch_state_dict

    sd = {"a.weight": np.arange(6, dtype=np.float32).reshape(2, 3),
          "b.num_batches_tracked": np.asarray(0, dtype=np.int64)}
    path = str(tmp_path / "ckpt.pt")
    save_torch_state_dict(sd, path)
    back = load_torch_state_dict(path)
    assert set(back) == set(sd)
    np.testing.assert_array_equal(back["a.weight"], sd["a.weight"])
    assert back["b.num_batches_tracked"].dtype == np.int64


def test_export_cli_roundtrip(tmp_path):
    """tools/export_torch.py: orbax checkpoint -> .pt the reference's own
    weight_utils.load_model_weight accepts (weight_utils.py:9-25)."""
    import optax

    from focal_tpu.models import build_backbone
    from focal_tpu.params.auto import set_auto_params
    from focal_tpu.params.cli import build_parser
    from focal_tpu.train import checkpoint as ckpt
    from focal_tpu.train.state import init_state
    from focal_tpu.utils.reference_loader import import_reference
    import tools.export_torch as export_cli

    argv = ["-dataset", "MOD_TINY", "-model", "DeepSense", "-learn_framework", "no",
            "-synthetic", "-batch_size", "4"]
    args = build_parser().parse_args(argv)
    args.option = "train"
    args.output_dir = str(tmp_path)
    args = set_auto_params(args)

    model = build_backbone(args)
    batch = _fixed_batch(args.dataset_config, b=2)  # freq-domain model input
    sample = jax.tree_util.tree_map(lambda a: jnp.asarray(a), batch)
    state = init_state(args, model, sample, optax.identity(), jax.random.key(0))
    ckpt_dir = str(tmp_path / "ckpt_best")
    ckpt.save_state(ckpt_dir, state)

    out_pt = str(tmp_path / "export.pt")
    export_cli.main(argv + ["-model_weight", ckpt_dir, "-torch_out", out_pt,
                            "-output_dir", str(tmp_path)])
    assert os.path.exists(out_pt)

    TorchDeepSense = import_reference("models.DeepSense").DeepSense
    targs = SimpleNamespace(
        dataset_config=args.dataset_config, device="cpu",
        task="vehicle_classification", train_mode="supervised",
    )
    torch.manual_seed(2)
    tm = TorchDeepSense(targs)
    weight_utils = import_reference("general_utils.weight_utils")
    weight_utils.load_model_weight(targs, tm, out_pt)
    tm.eval()
    _forward_parity(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        tm, args.dataset_config, batch,
    )
