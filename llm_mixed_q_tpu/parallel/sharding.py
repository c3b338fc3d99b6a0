"""Tensor/data-parallel sharding rules for model param pytrees.

Megatron-style TP over the "model" mesh axis (SURVEY.md §2.14 "required:
shard q/k/v/o and gate/up/down over model axis"):

- column-parallel (shard out-features, axis 0): q/k/v projections,
  gate/up (llama), fc1 (opt), query/key/value + intermediate.dense (bert),
  embed/lm_head/score along vocab/labels
- row-parallel (shard in-features, axis 1): o_proj/down (llama),
  out_proj/fc2 (opt), attention.output.dense + output.dense (bert)
- norms/bias-of-row-parallel: replicated

``fsdp=True`` additionally shards the replicated/major axis over "data"
(ZeRO-3 analogue — XLA all-gathers on use). Packed BFP leaves (codes int8
[out, in], scales f32 [out, in/block]) follow their node's rule; blocks
never straddle shards because the model axis divides out-features for
column-parallel nodes and scales inherit the same row split for row-parallel
nodes.

Specs are derived from the params pytree by path, so the same function
covers fake-quant arrays and packed tensors.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P
from jax.tree_util import tree_map_with_path

COLUMN_PARALLEL = (
    "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",  # llama
    # fused packed projections (pack.py fuse=True). Sharding the concat
    # out-dim is *correct* under XLA SPMD (the static split slices reshard),
    # but head locality is lost — prefer fuse=False when TP-sharding.
    "qkv_proj", "gate_up_proj",
    "fc1",  # opt
    "query", "key", "value", "intermediate",  # bert
    "embed_tokens", "lm_head", "score", "classifier",
)
ROW_PARALLEL = ("o_proj", "down_proj", "out_proj", "fc2")


def _path_names(path) -> list[str]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(f"#{k.idx}")
        else:
            names.append(str(k))
    return names


def _leaf_spec(path, leaf, fsdp: bool) -> P:
    names = _path_names(path)
    joined = ":".join(names)
    is_packed_scales = names[-1] == "#1" and names[-2] in ("weight",)
    is_weight_like = names[-1] in ("weight", "#0", "#1") or (
        len(names) >= 2 and names[-2] == "weight"
    )
    is_bias = names[-1] == "bias"

    # bert row-parallel "output:dense" (both attention.output and ffn output)
    row = any(n in ROW_PARALLEL for n in names) or (
        "output" in names and "dense" in names and "intermediate" not in names
    )
    col = any(n in COLUMN_PARALLEL for n in names) and not row

    ndim = getattr(leaf, "ndim", 0)
    data_axis = "data" if fsdp else None

    if is_bias:
        if col and ndim == 1:
            return P("model")
        return P(*([None] * ndim))
    # transposed sub-byte leaves (PackedBFPSubT, round-5 serving format):
    # [K-major, out] — out features on the LAST axis for both words and
    # scales. Registered with explicit key names, so match by path. K-splits
    # must land on packing-tile boundaries, which a generic row split does
    # not guarantee -> replicate row-parallel nodes, shard column-parallel
    # on the out axis.
    if names[-1] in ("words_t", "scales_t"):
        if col:
            return P(None, "model")
        return P(None, None)
    # sub-byte packed leaves: scales are rank-3 [n_tiles, out, cols]; words
    # are uint32 [out, K/per_word]. K-splits must land on packing-tile
    # boundaries, which a generic row split does not guarantee -> replicate
    # row-parallel sub-byte nodes, shard column-parallel on out-features.
    is_subbyte_words = (
        ndim == 2 and is_weight_like and str(getattr(leaf, "dtype", "")) == "uint32"
    )
    if ndim == 3 and is_weight_like:
        if col:
            return P(None, "model", None)
        return P(None, None, None)
    if is_subbyte_words:
        if col:
            return P("model", data_axis)
        return P(None, None)
    if ndim == 2 and is_weight_like:
        if row:
            # [out, in] sharded on in; packed scales [out, in/block] follow
            return P(data_axis, "model")
        if col:
            return P("model", data_axis)
        return P(data_axis, None)
    if ndim == 1:
        return P(None)
    return P(*([None] * ndim))


def param_specs(params, fsdp: bool = False):
    """PartitionSpec pytree matching ``params`` (incl. PackedBFP leaves)."""
    return tree_map_with_path(lambda p, x: _leaf_spec(p, x, fsdp), params)


def shard_params(params, mesh, fsdp: bool = False):
    from jax.sharding import NamedSharding

    specs = param_specs(params, fsdp=fsdp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
