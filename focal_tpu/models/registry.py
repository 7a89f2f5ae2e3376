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
    # tensor parallelism routes attention/convs through XLA: the pallas
    # kernels are shard_map'd over the data axis only, while GSPMD owns the
    # model-axis layout (parallel/tp.py docstring)
    mp = getattr(args, "model_parallel", 1) or 1
    if args.model == "DeepSense":
        from focal_tpu.models.deepsense import DeepSense

        # fused conv towers ship OPT-IN: measured 2.2x SLOWER than the XLA
        # lowering at reference channel dims (C=64 pads lanes 2x and the
        # kernel-chain grid overhead dominates; BASELINE.md "tried and
        # rejected"). -pallas_conv / args.force_pallas engage them.
        use_pallas = (
            bool(getattr(args, "pallas_conv", False))
            or bool(getattr(args, "force_pallas", False))
        ) and mp == 1
        return DeepSense(
            dataset_config=args.dataset_config,
            task=args.task,
            linear_class_head=linear_head,
            dtype=dtype,
            use_pallas=use_pallas,
        )
    if args.model == "SW_Transformer":
        import jax

        from focal_tpu.models.sw_transformer import SWTransformer
        from focal_tpu.parallel.mesh import make_mesh_plan

        # fused pallas attention: TPU only by default (the CPU interpreter is
        # slower than the XLA path; tests opt in via args.force_pallas). On a
        # >1-device mesh the kernels run under shard_map over the data axis;
        # with model_parallel > 1 the whole-block kernel shard_maps over
        # (data, model) with whole heads per model shard (swin.use_tp_block) —
        # the attention-only and MLP kernels stay DP-only (their weights would
        # need gathering under TP).
        on_tpu = jax.default_backend() in ("tpu", "axon")
        use_pallas = on_tpu or bool(getattr(args, "force_pallas", False))
        plan = (
            make_mesh_plan(getattr(args, "data_parallel", 0), mp) if use_pallas else None
        )
        return SWTransformer(
            dataset_config=args.dataset_config,
            task=args.task,
            linear_class_head=linear_head,
            dtype=dtype,
            use_pallas=use_pallas,
            use_pallas_block=use_pallas and not getattr(args, "no_pallas_block", False),
            # opt-in (-pallas_mlp): pays off only at wide dims (see SwinBlock)
            use_pallas_mlp=use_pallas and bool(getattr(args, "pallas_mlp", False)) and mp == 1,
            pallas_mesh=None if plan is None else plan.mesh,
        )
    raise ValueError(f"Invalid model provided: {args.model}")
