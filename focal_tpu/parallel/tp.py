"""Tensor parallelism: Megatron-style weight shardings over the ``model``
mesh axis.

The reference has no parallelism of any kind (src/params/params_util.py:20-55
selects one GPU); this is TPU-native framework surface beyond it. The design
is annotation-only: parameters (and their mirrored optimizer moments) are
placed with NamedShardings from the rules below, batches stay sharded over
``data`` only, and GSPMD propagates activation shardings / inserts the
collectives. No model code changes — the same flax modules run 1-device,
DP, and DP x TP.

What gets sharded (dimension must divide by the TP ways, else that leaf
falls back to replicated — so tiny recipes like MOD_TINY still run):

DeepSense (src/models/DeepSense.py:11-167 analogue):
- conv tower kernels/biases + their BatchNorm params/stats on the output-
  channel axis (all layers share one channel sharding; the residual adds
  stay shard-local),
- the per-interval ``out_proj`` Dense column-wise,
- projector MLP: Dense_0 column-parallel, Dense_1 row-parallel (the classic
  pair: one psum at the end, hidden activations never replicated).

SW_Transformer (src/models/SW_Transformer.py:17-304 analogue):
- every Swin block MLP: Dense_0 column-parallel, Dense_1 row-parallel
  (the MLP is the dominant matmul cost at wide dims — BASELINE.md's
  MOD_WIDE decomposition),
- the ``mod_in_layer`` flatten projection column-wise (the single largest
  parameter at wide dims),
- projector MLP as above.

Attention shards by WHOLE HEADS (round 4): the qkv projection stores its
kernel head-aligned as [C, 3, H, hd] (a lossless ravel of the fused
[C, 3C]; models/swin.py WindowAttention), so sharding axis 2 places whole
heads per device and the per-head attention math needs no resharding; the
output proj is row-parallel ([C, C] rows are head-major) and the relative-
position-bias table shards on its head axis. Fusion-block MHA
(nn.MultiHeadDotProductAttention) kernels are already head-shaped
[C, H, hd] / [H, hd, C] and shard the same way. Requires H % mp == 0,
else those leaves replicate.

Round 5: the PER-HEAD whole-block pallas kernel runs under TP too —
shard_map over (data, model) with whole heads per model shard
(ops.pallas_kernels.sharded_window_block_tp; routed by swin.WindowAttention
when the mesh has a ``model`` axis, H % mp == 0, and the per-head grid fits
VMEM). The attention-only, fused-MLP and conv-tower kernels remain DP-only
and fall back to XLA under TP.
"""

import re

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    """'params/loc_mod_extractor_shake_audio/ConvLayer2D_0/Conv_0/kernel'."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


# (regex searched in the path, required ndim, axis to shard over "model")
_RULES = (
    # DeepSense conv towers: output-channel sharding, uniform across the
    # tower so residual adds stay local. BatchNorm stats follow the channels.
    (re.compile(r"(loc_)?mod_extractor_[^/]+/ConvLayer2D_\d+/Conv_0/kernel$"), 4, -1),
    (re.compile(r"(loc_)?mod_extractor_[^/]+/ConvLayer2D_\d+/Conv_0/bias$"), 1, -1),
    (re.compile(r"(loc_)?mod_extractor_[^/]+/ConvLayer2D_\d+/BatchNorm_0/(scale|bias|mean|var)$"), 1, -1),
    # per-interval projection after the tower
    (re.compile(r"(loc_)?mod_extractor_[^/]+/out_proj/kernel$"), 2, -1),
    (re.compile(r"(loc_)?mod_extractor_[^/]+/out_proj/bias$"), 1, -1),
    # Swin block MLPs: column- then row-parallel
    (re.compile(r"/mlp/Dense_0/kernel$"), 2, -1),
    (re.compile(r"/mlp/Dense_0/bias$"), 1, -1),
    (re.compile(r"/mlp/Dense_1/kernel$"), 2, 0),
    # Swin window attention: whole heads per shard. qkv kernel [C, 3, H, hd]
    # shards the head axis; bias [3, H, hd] likewise; proj [C, C] rows are
    # head-major -> row-parallel; the rel-pos-bias table [(2wh-1)(2ww-1), H]
    # shards per head.
    (re.compile(r"/attn/qkv/kernel$"), 4, 2),
    (re.compile(r"/attn/qkv/bias$"), 3, 1),
    (re.compile(r"/attn/proj/kernel$"), 2, 0),
    (re.compile(r"/attn/relative_position_bias_table$"), 2, -1),
    # fusion-block MHA (flax MultiHeadDotProductAttention): per-head kernels
    (re.compile(r"/(query|key|value)/kernel$"), 3, 1),
    (re.compile(r"/(query|key|value)/bias$"), 2, 0),
    (re.compile(r"/out/kernel$"), 3, 0),
    # SW flatten projection (largest parameter at wide dims)
    (re.compile(r"mod_in_layer_[^/]+/kernel$"), 2, -1),
    (re.compile(r"mod_in_layer_[^/]+/bias$"), 1, -1),
    # projector MLPs (both backbones)
    (re.compile(r"mod_projector_[^/]+/Dense_0/kernel$"), 2, -1),
    (re.compile(r"mod_projector_[^/]+/Dense_0/bias$"), 1, -1),
    (re.compile(r"mod_projector_[^/]+/Dense_1/kernel$"), 2, 0),
)


def leaf_spec(path_str: str, shape, mp: int) -> P:
    """PartitionSpec for one array leaf under mp-way tensor parallelism."""
    for rx, ndim, axis in _RULES:
        if rx.search(path_str) is None:
            continue
        if len(shape) != ndim:
            continue
        dim = shape[axis]
        if dim % mp:
            return P()  # does not divide: replicate (correctness first)
        spec = [None] * ndim
        spec[axis if axis >= 0 else ndim + axis] = "model"
        return P(*spec)
    return P()


def state_shardings(state, mesh_plan):
    """NamedSharding pytree for a train state (params, batch_stats, optimizer
    moments — optax moment trees carry the same param paths, so the same
    rules bind them to the same shards). Non-TP plans -> fully replicated."""
    if mesh_plan is None:
        return None
    mesh, mp = mesh_plan.mesh, mesh_plan.mp
    if mp <= 1:
        return jax.tree_util.tree_map(lambda _: mesh_plan.replicated, state)

    def one(path, leaf):
        shape = getattr(leaf, "shape", None)
        if not shape:  # scalars (step counters, schedule counts)
            return mesh_plan.replicated
        return NamedSharding(mesh, leaf_spec(_path_str(path), shape, mp))

    return jax.tree_util.tree_map_with_path(one, state)


def put_state(state, mesh_plan):
    """Place a train state according to the TP rules (single-process)."""
    shardings = state_shardings(state, mesh_plan)
    if shardings is None:
        return jax.device_put(state)
    return jax.device_put(state, shardings)


def sharded_leaf_count(state, mesh_plan) -> int:
    """How many leaves actually carry a 'model' axis — used by tests and the
    startup log to prove TP is active rather than silently replicated."""
    if mesh_plan is None or mesh_plan.mp <= 1:
        return 0
    shardings = state_shardings(state, mesh_plan)

    def has_model(s):
        return isinstance(s, NamedSharding) and any(
            ax == "model" or (isinstance(ax, tuple) and "model" in ax) for ax in s.spec
        )

    return sum(1 for s in jax.tree_util.tree_leaves(shardings) if has_model(s))
