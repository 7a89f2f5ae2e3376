"""Backbone registry (reference: src/train_utils/model_selection.py:14-25)."""

import jax.numpy as jnp


def build_backbone(args):
    """Instantiate the backbone module named by args.model."""
    dtype = jnp.bfloat16 if getattr(args, "compute_dtype", "float32") == "bfloat16" else jnp.float32
    # linear head for supervised training or when the recipe says so
    # (reference: DeepSense.py:95, SW_Transformer.py:171)
    linear_head = (
        args.train_mode == "supervised"
        or args.dataset_config[args.model].get("pretrained_head", "linear") == "linear"
    )
    if args.model == "DeepSense":
        from focal_tpu.models.deepsense import DeepSense

        return DeepSense(
            dataset_config=args.dataset_config,
            task=args.task,
            linear_class_head=linear_head,
            dtype=dtype,
        )
    if args.model == "SW_Transformer":
        import jax

        from focal_tpu.models.sw_transformer import SWTransformer

        # fused pallas attention: TPU only (interpreter is slower than XLA on
        # CPU) and single-device meshes only (Mosaic kernels cannot be
        # auto-partitioned under a multi-chip jit)
        n_mesh = args.data_parallel if getattr(args, "data_parallel", 0) > 0 else len(jax.devices())
        on_tpu = jax.default_backend() in ("tpu", "axon")
        return SWTransformer(
            dataset_config=args.dataset_config,
            task=args.task,
            linear_class_head=linear_head,
            dtype=dtype,
            use_pallas=on_tpu and n_mesh <= 1,
        )
    raise ValueError(f"Invalid model provided: {args.model}")
