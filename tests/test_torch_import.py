"""Torch-checkpoint import: reference torch DeepSense -> flax params, forward
parity on a fixed batch (reference: src/models/DeepSense.py:11-167,
src/general_utils/weight_utils.py:9-25).

The reference model is imported from /root/reference/src (torch-only imports)
to make the round-trip authentic: init torch model -> state_dict -> import ->
compare eval forwards in f32.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def torch_deepsense_and_cfg():
    from focal_tpu.params.yaml_utils import load_dataset_config
    from focal_tpu.utils.reference_loader import import_reference

    cfg = load_dataset_config("MOD_TINY")
    TorchDeepSense = import_reference("models.DeepSense").DeepSense

    args = SimpleNamespace(
        dataset_config=cfg, device="cpu", task="vehicle_classification", train_mode="supervised"
    )
    torch.manual_seed(0)
    tm = TorchDeepSense(args)
    tm.eval()
    return tm, cfg


def _fixed_batch(cfg, b=3):
    rng = np.random.default_rng(7)
    out = {}
    for loc in cfg["location_names"]:
        out[loc] = {}
        for mod in cfg["modality_names"]:
            c = cfg["loc_mod_in_freq_channels"][loc][mod]
            s = cfg["loc_mod_spectrum_len"][loc][mod]
            i = cfg["num_segments"]
            out[loc][mod] = rng.normal(size=(b, c, i, s)).astype(np.float32)
    return out


def test_deepsense_torch_import_forward_parity(torch_deepsense_and_cfg):
    tm, cfg = torch_deepsense_and_cfg
    from focal_tpu.models.deepsense import DeepSense
    from focal_tpu.utils.torch_import import import_deepsense_state_dict

    model = DeepSense(dataset_config=cfg, task="vehicle_classification", linear_class_head=True)
    batch = _fixed_batch(cfg)
    jx = {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in batch.items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, jx, train=False, head="both"
    )

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_deepsense_state_dict(sd, variables, cfg)

    got_logits = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jx, train=False, head="class")
    )
    with torch.no_grad():
        tx = {loc: {m: torch.from_numpy(a) for m, a in mods.items()} for loc, mods in batch.items()}
        want_logits = tm(tx, class_head=True).numpy()
    np.testing.assert_allclose(got_logits, want_logits, atol=1e-4)

    # projection head path too (pretrain surface)
    got_proj = model.apply(
        {"params": params, "batch_stats": stats}, jx, train=False, head="proj"
    )
    with torch.no_grad():
        want_proj = tm(tx, class_head=False, proj_head=True)
    for mod in cfg["modality_names"]:
        np.testing.assert_allclose(
            np.asarray(got_proj[mod]), want_proj[mod].numpy(), atol=1e-4
        )


def test_sw_transformer_torch_import_forward_parity():
    """Round-trip the reference torch SW_Transformer (Swin stack + fusion +
    heads) into flax params and require forward parity on a fixed batch —
    this simultaneously certifies the whole Swin geometry (windows, shifts,
    masks, rel-pos bias, merging) against the reference
    (src/models/SW_Transformer.py, SwinModules.py)."""
    from focal_tpu.models.sw_transformer import SWTransformer
    from focal_tpu.params.yaml_utils import load_dataset_config
    from focal_tpu.utils.reference_loader import import_reference
    from focal_tpu.utils.torch_import import import_sw_transformer_state_dict

    cfg = dict(load_dataset_config("MOD_TINY"))
    # the reference hard-codes timm's mlp_ratio=4 (SwinModules.py:200 — the
    # yaml key is decorative there); MOD_TINY shrinks it, so align for parity
    cfg["SW_Transformer"] = dict(cfg["SW_Transformer"], mlp_ratio=4.0)
    TorchSW = import_reference("models.SW_Transformer").SW_Transformer
    args = SimpleNamespace(
        dataset_config=cfg, device="cpu", task="vehicle_classification", train_mode="supervised"
    )
    torch.manual_seed(0)
    tm = TorchSW(args)
    tm.eval()

    model = SWTransformer(dataset_config=cfg, task="vehicle_classification", linear_class_head=True)
    batch = _fixed_batch(cfg)
    jx = {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in batch.items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, jx, train=False, head="both"
    )

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, _ = import_sw_transformer_state_dict(sd, variables, cfg)

    got = np.asarray(model.apply({"params": params}, jx, train=False, head="class"))
    with torch.no_grad():
        tx = {loc: {m: torch.from_numpy(a) for m, a in mods.items()} for loc, mods in batch.items()}
        want = tm(tx, class_head=True).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)

    got_proj = model.apply({"params": params}, jx, train=False, head="proj")
    with torch.no_grad():
        want_proj = tm(tx, class_head=False, proj_head=True)
    for mod in cfg["modality_names"]:
        np.testing.assert_allclose(
            np.asarray(got_proj[mod]), want_proj[mod].numpy(), atol=1e-4
        )


def test_import_rejects_shape_mismatch(torch_deepsense_and_cfg):
    tm, cfg = torch_deepsense_and_cfg
    from focal_tpu.models.deepsense import DeepSense
    from focal_tpu.utils.torch_import import import_deepsense_state_dict

    model = DeepSense(dataset_config=cfg, task="vehicle_classification", linear_class_head=True)
    batch = _fixed_batch(cfg, b=1)
    jx = {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in batch.items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, jx, train=False, head="both"
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    bad = dict(sd)
    bad["class_layer.0.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="Shape mismatch"):
        import_deepsense_state_dict(bad, variables, cfg)


def test_load_class_layer_false_keeps_head(torch_deepsense_and_cfg):
    """load_class_layer=False mirrors the reference finetune rule
    (weight_utils.py:18-21): the flax head keeps its init values."""
    tm, cfg = torch_deepsense_and_cfg
    from focal_tpu.models.deepsense import DeepSense
    from focal_tpu.utils.torch_import import import_deepsense_state_dict

    model = DeepSense(dataset_config=cfg, task="vehicle_classification", linear_class_head=True)
    batch = _fixed_batch(cfg, b=1)
    jx = {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in batch.items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, jx, train=False, head="both"
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, _ = import_deepsense_state_dict(sd, variables, cfg, load_class_layer=False)
    np.testing.assert_array_equal(
        np.asarray(params["class_layer"]["Dense_0"]["kernel"]),
        np.asarray(variables["params"]["class_layer"]["Dense_0"]["kernel"]),
    )
    # but the backbone WAS imported
    assert not np.allclose(
        np.asarray(params["mod_projector_audio"]["Dense_0"]["kernel"]),
        np.asarray(variables["params"]["mod_projector_audio"]["Dense_0"]["kernel"]),
    )


def test_imported_backbone_finetunes_here(torch_deepsense_and_cfg, tmp_path):
    """The migration story end-to-end: import a reference-pretrained torch
    backbone, then run finetune steps in THIS framework — the classifier
    head trains, the imported backbone stays bit-frozen (the reference
    finetune rule), and the loss is finite."""
    import optax

    from focal_tpu.models.deepsense import DeepSense
    from focal_tpu.train.losses import cross_entropy
    from focal_tpu.train.optim import build_optimizer
    from focal_tpu.utils.torch_import import import_deepsense_state_dict

    tm, cfg = torch_deepsense_and_cfg
    # the minimal args surface build_optimizer/trainable_mask consume
    # (set_auto_params would demand an existing pretrain experiment folder)
    args = SimpleNamespace(
        dataset_config=cfg, model="DeepSense", learn_framework="FOCAL",
        stage="finetune", train_mode="contrastive", clip_grad=False,
    )

    model = DeepSense(dataset_config=cfg, task="vehicle_classification", linear_class_head=True)
    batch = _fixed_batch(cfg, b=8)
    jx = {loc: {m: jnp.asarray(a) for m, a in mods.items()} for loc, mods in batch.items()}
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, jx, train=False, head="both"
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = import_deepsense_state_dict(sd, variables, cfg, load_class_layer=False)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)

    tx, _ = build_optimizer(args, params, steps_per_epoch=1, epochs_override=5)
    opt_state = tx.init(params)
    labels = jnp.asarray(np.arange(8) % cfg["vehicle_classification"]["num_classes"])

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": stats}, jx, train=False, head="class")
        return cross_entropy(out, labels)

    p = params
    losses = []
    for _ in range(3):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # head moved, imported backbone bit-identical (finetune freeze rule)
    assert not np.allclose(
        np.asarray(p["class_layer"]["Dense_0"]["kernel"]),
        np.asarray(params["class_layer"]["Dense_0"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(p["loc_mod_extractor_shake_audio"]["ConvLayer2D_0"]["Conv_0"]["kernel"]),
        np.asarray(params["loc_mod_extractor_shake_audio"]["ConvLayer2D_0"]["Conv_0"]["kernel"]),
    )
