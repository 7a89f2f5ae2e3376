"""SW_Transformer backbone: hierarchical shifted-window attention over
time-frequency patches, per (loc, mod), with attention-based modality fusion
(reference: src/models/SW_Transformer.py:17-304).

Geometry parity: input spectra are folded by ``in_stride`` and zero-padded to
a Swin-divisible size (reference: SW_Transformer.py:184-208 +
src/input_utils/padding_utils.py:4-28); stages halve resolution and double
channels via PatchMerging.

The modality fusion block is named ``mod_fusion_layer`` so the finetune
trainability rule ("class_layer" or "mod_fusion_layer";
reference: weight_utils.py:63-82) applies unchanged.
"""

import math
from collections.abc import Mapping
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from focal_tpu.models.layers import AttentionFusion, ClassHead, ProjectionHead
from focal_tpu.models.swin import BasicLayer, PatchEmbed

import numpy as np


def get_padded_size(img_size, window_size, patch_size, num_stages):
    """Smallest size >= img_size divisible by window*patch*2^(stages-1)
    (reference: padding_utils.py:4-28)."""
    scale = 2 ** (num_stages - 1)
    unit_h = window_size[0] * patch_size[0] * scale
    unit_w = window_size[1] * patch_size[1] * scale
    out = [max(unit_h, img_size[0]), max(unit_w, img_size[1])]
    for i, unit in enumerate((unit_h, unit_w)):
        if out[i] % unit != 0:
            out[i] = unit * math.ceil(out[i] / unit)
    return tuple(out)


class SWTransformer(nn.Module):
    dataset_config: Dict[str, Any]
    task: str
    linear_class_head: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_block: bool = False
    use_pallas_mlp: bool = False
    pallas_mesh: Any = None

    def setup(self):
        cfgs = self.dataset_config
        config = cfgs["SW_Transformer"]
        self.config_ = config
        self.modalities = cfgs["modality_names"]
        self.locations = cfgs["location_names"]
        self.num_segments = cfgs["num_segments"]
        self.multi_location = len(self.locations) > 1

        embed_dim = config["time_freq_out_channels"]
        patch_embeds, stage_lists, mod_in_layers = {}, {}, {}
        geometries, ape_params = {}, {}
        for loc in self.locations:
            for mod in self.modalities:
                stride = config["in_stride"][mod]
                spectrum_len = cfgs["loc_mod_spectrum_len"][loc][mod]
                img_size = (self.num_segments, spectrum_len // stride)
                block_num = list(config["time_freq_block_num"][mod])
                window = list(config["window_size"][mod])
                patch = list(config["patch_size"]["freq"][mod])
                padded = get_padded_size(img_size, window, patch, len(block_num))
                patches_res = (padded[0] // patch[0], padded[1] // patch[1])
                geometries[(loc, mod)] = {
                    "stride": stride,
                    "img_size": img_size,
                    "padded": padded,
                    "patches_res": patches_res,
                }

                patch_embeds[f"{loc}_{mod}"] = PatchEmbed(
                    patch_size=patch,
                    embed_dim=embed_dim,
                    norm=config.get("patch_norm", True),
                    dtype=self.dtype,
                    name=f"patch_embed_{loc}_{mod}",
                )

                # absolute position embedding, added post-patch-embed when the
                # recipe sets APE: True (reference: SW_Transformer.py:76-79,
                # 223-224 — trunc_normal(0.02) init over [1, num_patches, C])
                if config.get("APE", False):
                    ape_params[f"{loc}_{mod}"] = self.param(
                        f"absolute_pos_embed_{loc}_{mod}",
                        nn.initializers.truncated_normal(0.02),
                        (1, patches_res[0] * patches_res[1], embed_dim),
                    )

                # stochastic depth decay across all blocks (SW_Transformer.py:85-90)
                total_blocks = sum(block_num)
                dpr = list(np.linspace(0, config.get("drop_path_rate", 0.0), total_blocks))
                stages = []
                for i_layer, depth in enumerate(block_num):
                    down = 2**i_layer
                    stages.append(
                        BasicLayer(
                            dim=int(embed_dim * down),
                            input_resolution=(patches_res[0] // down, patches_res[1] // down),
                            depth=depth,
                            num_heads=config["time_freq_head_num"],
                            window_size=window,
                            mlp_ratio=float(config.get("mlp_ratio", 4.0)),
                            qkv_bias=bool(config.get("qkv_bias", True)),
                            drop=config["dropout_ratio"],
                            attn_drop=config.get("attn_drop_rate", 0.0),
                            drop_path=tuple(dpr[sum(block_num[:i_layer]) : sum(block_num[: i_layer + 1])]),
                            downsample=i_layer < len(block_num) - 1,
                            dtype=self.dtype,
                            use_pallas=self.use_pallas,
                            use_pallas_block=self.use_pallas_block,
                            use_pallas_mlp=self.use_pallas_mlp,
                            pallas_mesh=self.pallas_mesh,
                            name=f"stage{i_layer}_{loc}_{mod}",
                        )
                    )
                stage_lists[f"{loc}_{mod}"] = stages

                final_down = 2 ** (len(block_num) - 1)
                final_tokens = (patches_res[0] // final_down) * (patches_res[1] // final_down)
                final_dim = int(embed_dim * final_down)
                mod_in_layers[f"{loc}_{mod}"] = nn.Dense(
                    config["loc_out_channels"], dtype=self.dtype, name=f"mod_in_layer_{loc}_{mod}"
                )
                geometries[(loc, mod)]["final"] = (final_tokens, final_dim)

        self.patch_embeds = patch_embeds
        self.stage_lists = stage_lists
        self.mod_in_layers = mod_in_layers
        self.geometries = geometries
        self.ape_params = ape_params

        if self.multi_location:
            # per-mod location context + fusion (SW_Transformer.py:126-150)
            self.loc_context_layers = {
                mod: [
                    TransformerEncoderLayer(
                        dim=config["loc_out_channels"],
                        num_heads=config["loc_head_num"],
                        ffn_dim=config["loc_out_channels"],
                        dropout=config["dropout_ratio"],
                        dtype=self.dtype,
                        name=f"loc_context_{mod}_{i}",
                    )
                    for i in range(config["loc_block_num"])
                ]
                for mod in self.modalities
            }
            self.loc_fusion_layers = {
                mod: AttentionFusion(
                    num_heads=config["loc_head_num"],
                    dropout_ratio=config["dropout_ratio"],
                    dtype=self.dtype,
                    name=f"loc_fusion_{mod}",
                )
                for mod in self.modalities
            }

        emb_dim = cfgs["FOCAL"]["emb_dim"]
        self.mod_projectors = {
            mod: ProjectionHead(emb_dim, dtype=self.dtype, name=f"mod_projector_{mod}")
            for mod in self.modalities
        }
        self.mod_fusion_layer = AttentionFusion(
            num_heads=config["loc_head_num"],
            dropout_ratio=config["dropout_ratio"],
            dtype=self.dtype,
            name="mod_fusion_layer",
        )
        self.class_layer = ClassHead(
            num_classes=cfgs[self.task]["num_classes"],
            fc_dim=config["fc_dim"],
            linear=self.linear_class_head,
            dtype=self.dtype,
            name="class_layer",
        )

    def pad_input(self, x, loc, mod):
        """Fold spectrum by stride, pad to the Swin-divisible size, NHWC out
        (reference: SW_Transformer.py:184-208)."""
        geo = self.geometries[(loc, mod)]
        stride = geo["stride"]
        b, c, i, s = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1))  # [b, i, s, c]
        x = x.reshape(b, i, s // stride, c * stride)
        pad_h = geo["padded"][0] - geo["img_size"][0]
        pad_w = geo["padded"][1] - geo["img_size"][1]
        return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

    def encode(self, freq_x, train: bool):
        """-> {mod: [b, loc_out_channels]}."""
        mod_loc_features = {mod: [] for mod in self.modalities}
        for loc in self.locations:
            for mod in self.modalities:
                x = freq_x[loc][mod].astype(self.dtype)
                x = self.pad_input(x, loc, mod)
                x = self.patch_embeds[f"{loc}_{mod}"](x)
                if f"{loc}_{mod}" in self.ape_params:
                    x = x + self.ape_params[f"{loc}_{mod}"].astype(self.dtype)
                for stage in self.stage_lists[f"{loc}_{mod}"]:
                    x = stage(x, train)
                b = x.shape[0]
                x = self.mod_in_layers[f"{loc}_{mod}"](x.reshape(b, -1))
                mod_loc_features[mod].append(x)

        mod_features = {}
        for mod in self.modalities:
            if self.multi_location:
                # [b, n_loc, c] with per-loc context then attention fusion
                stack = jnp.stack(mod_loc_features[mod], axis=1)
                for layer in self.loc_context_layers[mod]:
                    stack = layer(stack, train)
                fused = self.loc_fusion_layers[mod](stack[:, None], train)  # [b, 1, c]
                mod_features[mod] = fused[:, 0]
            else:
                mod_features[mod] = mod_loc_features[mod][0]
        return mod_features

    def __call__(self, freq_x, train: bool = False, head: str = "class"):
        mod_features = self.encode(freq_x, train)

        if head == "feat":
            return mod_features
        if head == "proj":
            return {mod: self.mod_projectors[mod](mod_features[mod]) for mod in self.modalities}

        # attention fusion over modalities then classify (SW_Transformer.py:269-276)
        stacked = jnp.stack([mod_features[mod] for mod in self.modalities], axis=1)  # [b, n_mod, c]
        fused = self.mod_fusion_layer(stacked[:, None], train)[:, 0]  # [b, c]
        logits = self.class_layer(fused.astype(self.dtype)).astype(jnp.float32)
        if head == "class":
            return logits
        if head == "both":
            proj = {mod: self.mod_projectors[mod](mod_features[mod]) for mod in self.modalities}
            return logits, proj
        raise ValueError(f"Unknown head: {head}")


class TransformerEncoderLayer(nn.Module):
    """Post-norm MHA + FFN layer (torch TransformerEncoderLayer equivalent,
    used for multi-location context; reference: SW_Transformer.py:131-142)."""

    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
        )(x, x, x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + nn.Dropout(self.dropout, deterministic=not train)(attn))
        y = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x + nn.Dropout(self.dropout, deterministic=not train)(y))
