"""DeepSense backbone.

Per-(loc, mod) conv encoder -> (multi-location: mean fusion + per-mod conv)
-> per-mod bidirectional GRU over intervals -> heads
(reference: src/models/DeepSense.py:11-167).

TPU notes: inputs arrive as the frequency-domain pytree
{loc: {mod: [b, 2c, i, s]}} and are transposed once to NHWC; all convs/dense
run in the configured compute dtype (bf16 on TPU), while BatchNorm statistics
and the GRU stay float32.

Head selection is static (one of "class" / "proj" / "feat" / "both"):
  class -> logits [b, num_classes]              (supervised / finetune)
  proj  -> {mod: [b, emb_dim]}                  (FOCAL pretrain views)
  feat  -> {mod: [b, 2*recurrent_dim]}          (KNN probe features)
"""

from collections.abc import Mapping
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from focal_tpu.models.layers import (
    AttentionFusion,  # noqa: F401  (exported for parity with the fusion registry)
    BiGRU,
    ClassHead,
    ConvBlock,
    MeanFusion,
    ProjectionHead,
)


class DeepSense(nn.Module):
    dataset_config: Dict[str, Any]
    task: str
    linear_class_head: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False  # fused conv-tower kernels for train steps

    def setup(self):
        cfgs = self.dataset_config
        config = cfgs["DeepSense"]
        self.modalities = cfgs["modality_names"]
        self.locations = cfgs["location_names"]
        self.multi_location = len(self.locations) > 1

        # Step 1: per-(loc, mod) extractors (reference: DeepSense.py:33-56)
        extractors = {}
        for loc in self.locations:
            for mod in self.modalities:
                # Mapping, not dict: flax deep-freezes module attrs to FrozenDict
                if isinstance(config["loc_mod_conv_lens"], Mapping):
                    conv_lens = config["loc_mod_conv_lens"][mod]
                    in_stride = config["loc_mod_in_conv_stride"][mod]
                else:
                    conv_lens = config["loc_mod_conv_lens"]
                    in_stride = (1, 1)
                extractors[f"{loc}_{mod}"] = ConvBlock(
                    out_channels=config["loc_mod_out_channels"],
                    conv_lens=conv_lens,
                    num_inter_layers=config["loc_mod_conv_inter_layers"],
                    in_stride=in_stride,
                    dropout_ratio=config["dropout_ratio"],
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    name=f"loc_mod_extractor_{loc}_{mod}",
                )
        self.loc_mod_extractors = extractors

        # Step 2: location fusion (only active with >1 locations,
        # reference: DeepSense.py:58-71,124-132)
        if self.multi_location:
            self.loc_fusion = {mod: MeanFusion(name=f"loc_fusion_{mod}") for mod in self.modalities}
            self.mod_extractors = {
                mod: ConvBlock(
                    out_channels=config["loc_out_channels"],
                    conv_lens=config["loc_conv_lens"],
                    num_inter_layers=config["loc_conv_inter_layers"],
                    dropout_ratio=config["dropout_ratio"],
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    name=f"mod_extractor_{mod}",
                )
                for mod in self.modalities
            }

        # Step 3: per-mod recurrent pooling (reference: DeepSense.py:73-81)
        self.recurrent_layers = {
            mod: BiGRU(
                hidden=config["recurrent_dim"],
                num_layers=config["recurrent_layers"],
                dropout_ratio=config["dropout_ratio"],
                name=f"recurrent_{mod}",
            )
            for mod in self.modalities
        }

        # heads (reference: DeepSense.py:83-106)
        emb_dim = cfgs["FOCAL"]["emb_dim"]
        self.mod_projectors = {
            mod: ProjectionHead(emb_dim, dtype=self.dtype, name=f"mod_projector_{mod}")
            for mod in self.modalities
        }
        self.class_layer = ClassHead(
            num_classes=cfgs[self.task]["num_classes"],
            fc_dim=config["fc_dim"],
            linear=self.linear_class_head,
            dtype=self.dtype,
            name="class_layer",
        )

    def encode(self, freq_x, train: bool):
        """Encoder shared by all heads -> {mod: [b, 2*recurrent_dim]}."""
        mod_features = {}
        for mod in self.modalities:
            per_loc = []
            for loc in self.locations:
                x = freq_x[loc][mod].astype(self.dtype)
                x = jnp.transpose(x, (0, 2, 3, 1))  # [b, i, s, c] NHWC
                per_loc.append(self.loc_mod_extractors[f"{loc}_{mod}"](x, train))
            if self.multi_location:
                stacked = jnp.stack(per_loc, axis=2)  # [b, i, n_loc, c]
                fused = self.loc_fusion[mod](stacked)  # [b, i, c]
                # reference feeds the fused map back through a conv block with
                # a single input channel and spectrum = feature dim
                # (DeepSense.py:130-131): NHWC [b, i, c, 1]
                feat = self.mod_extractors[mod](fused[..., None], train)
            else:
                feat = per_loc[0]  # [b, i, c]
            mod_features[mod] = self.recurrent_layers[mod](feat, train)
        return mod_features

    def __call__(self, freq_x, train: bool = False, head: str = "class"):
        mod_features = self.encode(freq_x, train)

        if head == "feat":
            return mod_features
        if head == "proj":
            return {mod: self.mod_projectors[mod](mod_features[mod]) for mod in self.modalities}

        concat = jnp.concatenate([mod_features[mod] for mod in self.modalities], axis=1)
        logits = self.class_layer(concat.astype(self.dtype)).astype(jnp.float32)
        if head == "class":
            return logits
        if head == "both":  # used at init so every head's params exist
            proj = {mod: self.mod_projectors[mod](mod_features[mod]) for mod in self.modalities}
            return logits, proj
        raise ValueError(f"Unknown head: {head}")
