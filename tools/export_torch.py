"""Export a focal_tpu checkpoint as a reference-compatible torch .pt file.

The reverse migration direction: backbones pretrained/finetuned HERE (on
TPU) become plain ``state_dict()`` files the reference stack loads with its
own ``weight_utils.load_model_weight``
(reference: src/general_utils/weight_utils.py:9-25) — so a user can train
on TPU and keep serving/finetuning on an existing torch deployment.

    python tools/export_torch.py -dataset MOD -model DeepSense \
        -learn_framework FOCAL -model_weight weights/MOD_DeepSense/exp0 \
        -torch_out MOD_DeepSense_pretrain.pt

``-model_weight`` takes the orbax checkpoint directory (or the experiment
folder — the best/latest resolution of test.py applies). Layout
conversions and strict-load compatibility are certified in
tests/test_torch_export.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FOCAL_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FOCAL_PLATFORM"])


def main(argv=None):
    from focal_tpu.params import parse_test_params
    from focal_tpu.train import checkpoint as ckpt
    from focal_tpu.utils.torch_export import (
        export_deepsense_state_dict,
        export_sw_transformer_state_dict,
        save_torch_state_dict,
    )

    args = parse_test_params(argv)
    # -model_weight may be an experiment folder (resolved to the stage's
    # best checkpoint by the test-path derivation) or a raw orbax dir
    candidates = [getattr(args, "classifier_weight", None), args.model_weight]
    path = next((p for p in candidates if p and os.path.isdir(p)), None)
    if not path:
        raise SystemExit("No checkpoint: pass -model_weight <orbax dir or exp folder>")
    out_path = getattr(args, "torch_out", None) or (
        f"{args.dataset}_{args.model}_{args.task}_export.pt"
    )

    restored = ckpt.restore(path)
    params = restored["params"]
    batch_stats = restored.get("batch_stats") or {}
    if args.model == "DeepSense":
        sd = export_deepsense_state_dict(params, batch_stats, args.dataset_config)
    else:
        sd = export_sw_transformer_state_dict(params, args.dataset_config)
    save_torch_state_dict(sd, out_path)
    n_params = sum(int(v.size) for v in sd.values())
    print(f"Exported {len(sd)} tensors ({n_params:,} values) from {path}")
    print(f"Wrote {out_path} — load in the reference with "
          f"weight_utils.load_model_weight(args, model, '{os.path.abspath(out_path)}')")


if __name__ == "__main__":
    main()
