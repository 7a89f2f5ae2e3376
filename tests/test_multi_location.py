"""Multi-location model paths (reference: DeepSense.py:124-132 location
fusion + mod extractors, SW_Transformer.py:126-150 location context/fusion).
The shipped MOD recipe is single-location; these tests exercise the 2-location
branches end-to-end with a synthetic recipe."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def two_loc_config():
    from focal_tpu.params.yaml_utils import load_dataset_config

    cfg = copy.deepcopy(load_dataset_config("MOD_TINY"))
    cfg["location_names"] = ["shake", "tower"]
    cfg["num_location"] = 2
    for key in ("loc_modalities", "loc_mod_in_freq_channels", "loc_mod_in_time_channels", "loc_mod_spectrum_len"):
        cfg[key]["tower"] = copy.deepcopy(cfg[key]["shake"])
    return cfg


def _freq_batch(cfg, b=4):
    rng = np.random.default_rng(0)
    out = {}
    for loc in cfg["location_names"]:
        out[loc] = {}
        for mod in cfg["loc_modalities"][loc]:
            s = cfg["loc_mod_spectrum_len"][loc][mod]
            c = cfg["loc_mod_in_freq_channels"][loc][mod]
            out[loc][mod] = jnp.asarray(rng.normal(size=(b, c, 10, s)).astype(np.float32))
    return out


def test_deepsense_two_locations(two_loc_config):
    from focal_tpu.models.deepsense import DeepSense

    model = DeepSense(dataset_config=two_loc_config, task="vehicle_classification", linear_class_head=True)
    x = _freq_batch(two_loc_config)
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False, head="both")
    logits, proj = model.apply(v, x, train=False, head="both")
    assert logits.shape == (4, 7)
    assert proj["audio"].shape == (4, 32)
    # location-fusion params exist
    names = str(jax.tree_util.tree_structure(v["params"]))
    assert "mod_extractor_" in names
    # both locations contribute: zeroing one location changes the output
    x2 = jax.tree_util.tree_map(lambda a: a, x)
    x2 = {**x2, "tower": {m: jnp.zeros_like(a) for m, a in x["tower"].items()}}
    logits2 = model.apply(v, x2, train=False, head="class")
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_swin_two_locations(two_loc_config):
    from focal_tpu.models.sw_transformer import SWTransformer

    model = SWTransformer(dataset_config=two_loc_config, task="vehicle_classification", linear_class_head=True)
    x = _freq_batch(two_loc_config)
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False, head="both")
    logits, proj = model.apply(v, x, train=False, head="both")
    assert logits.shape == (4, 7)
    assert proj["seismic"].shape == (4, 32)
    names = str(jax.tree_util.tree_structure(v["params"]))
    assert "loc_context_" in names and "loc_fusion_" in names
    # jitted train call works on the multi-loc path too
    out = jax.jit(
        lambda v, x: model.apply(v, x, train=True, head="class", rngs={"dropout": jax.random.key(2)})
    )(v, x)
    assert out.shape == (4, 7)


def test_three_modalities_har():
    """RealWorld_HAR-style 3-modality forward (acc/gyro/mag)."""
    from focal_tpu.params.yaml_utils import load_dataset_config
    from focal_tpu.models.deepsense import DeepSense

    cfg = copy.deepcopy(load_dataset_config("RealWorld_HAR"))
    # shrink for CPU
    cfg["DeepSense"]["loc_mod_out_channels"] = 32
    cfg["DeepSense"]["loc_mod_conv_inter_layers"] = 1
    cfg["DeepSense"]["recurrent_dim"] = 32
    cfg["FOCAL"]["emb_dim"] = 32
    model = DeepSense(dataset_config=cfg, task="activity_classification", linear_class_head=True)
    rng = np.random.default_rng(1)
    x = {
        "waist": {
            m: jnp.asarray(rng.normal(size=(4, 6, 10, 25)).astype(np.float32))
            for m in ["acc", "gyro", "mag"]
        }
    }
    v = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False, head="both")
    logits, proj = model.apply(v, x, train=False, head="both")
    assert logits.shape == (4, 8)
    assert set(proj) == {"acc", "gyro", "mag"}
