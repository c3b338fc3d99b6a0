"""HuggingFace checkpoint -> JAX param pytree loaders.

Replaces the reference's ``from_pretrained`` torch path
(e.g. src/llm_mixed_q/cli/eval_perplexity.py:63-75). Weights keep the torch
``[out, in]`` layout (no transposes; ``quantized_linear`` contracts the last
axes), so loading is pure name mapping. Loaders accept:
- a flat ``{hf_name: np.ndarray}`` dict (tests feed a torch ``state_dict``)
- a model directory with ``*.safetensors`` or ``pytorch_model*.bin``
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:  # torch tensor without importing torch at module scope
        return v.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(v)


def load_flat_state_dict(model_dir: str | Path) -> dict[str, np.ndarray]:
    model_dir = Path(model_dir)
    flat: dict[str, np.ndarray] = {}
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            flat.update(load_file(str(f)))
        return flat
    bin_files = sorted(model_dir.glob("pytorch_model*.bin"))
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            flat.update({k: _to_numpy(v) for k, v in sd.items()})
        return flat
    raise FileNotFoundError(f"No safetensors/bin weights in {model_dir}")


def _normalize(flat: dict) -> dict[str, np.ndarray]:
    return {k: _to_numpy(v).astype(np.float32) for k, v in flat.items()}


def _leaf(flat, name, required=True):
    if name in flat:
        return flat[name]
    if required:
        raise KeyError(f"Missing weight: {name}")
    return None


def _linear(flat, prefix, bias=True):
    p = {"weight": _leaf(flat, f"{prefix}.weight")}
    b = _leaf(flat, f"{prefix}.bias", required=False) if bias else None
    if b is not None:
        p["bias"] = b
    return p


# ---------------------------------------------------------------- llama


def llama_params_from_flat(flat: dict, config, task: str = "lm") -> dict:
    flat = _normalize(flat)
    pre = "model." if any(k.startswith("model.") for k in flat) else ""
    layers = []
    for i in range(config.num_hidden_layers):
        lp = f"{pre}layers.{i}."
        layers.append(
            {
                "input_layernorm": {"weight": _leaf(flat, lp + "input_layernorm.weight")},
                "post_attention_layernorm": {
                    "weight": _leaf(flat, lp + "post_attention_layernorm.weight")
                },
                "self_attn": {
                    n: _linear(flat, lp + f"self_attn.{n}")
                    for n in ("q_proj", "k_proj", "v_proj", "o_proj")
                },
                "mlp": {
                    n: _linear(flat, lp + f"mlp.{n}")
                    for n in ("gate_proj", "up_proj", "down_proj")
                },
            }
        )
    params = {
        "embed_tokens": {"weight": _leaf(flat, pre + "embed_tokens.weight")},
        "layers": layers,
        "norm": {"weight": _leaf(flat, pre + "norm.weight")},
    }
    if task == "lm":
        lm_head = _leaf(flat, "lm_head.weight", required=False)
        if lm_head is not None:
            params["lm_head"] = {"weight": lm_head}
        elif not config.tie_word_embeddings:
            params["lm_head"] = {"weight": flat[pre + "embed_tokens.weight"]}
    elif task == "cls":
        score = _leaf(flat, "score.weight", required=False)
        params["score"] = {
            "weight": score
            if score is not None
            else np.zeros((config.num_labels, config.hidden_size), np.float32)
        }
    return params


def init_llama_params(config, task: str = "lm", seed: int = 0) -> dict:
    """Random-init pytree (tests / QAT-from-scratch)."""
    rng = np.random.default_rng(seed)
    h, inter, v = config.hidden_size, config.intermediate_size, config.vocab_size
    kvh = config.num_key_value_heads * config.head_dim

    def w(*shape, scale=0.02):
        # direct f32 generation: the f64 path generated 27GB of doubles for a
        # 7B init (444s of the 1500s bench budget on this box)
        return rng.standard_normal(shape, dtype=np.float32) * np.float32(scale)

    layers = []
    for _ in range(config.num_hidden_layers):
        layers.append(
            {
                "input_layernorm": {"weight": np.ones(h, np.float32)},
                "post_attention_layernorm": {"weight": np.ones(h, np.float32)},
                "self_attn": {
                    "q_proj": {"weight": w(h, h)},
                    "k_proj": {"weight": w(kvh, h)},
                    "v_proj": {"weight": w(kvh, h)},
                    "o_proj": {"weight": w(h, h)},
                },
                "mlp": {
                    "gate_proj": {"weight": w(inter, h)},
                    "up_proj": {"weight": w(inter, h)},
                    "down_proj": {"weight": w(h, inter)},
                },
            }
        )
    params = {
        "embed_tokens": {"weight": w(v, h)},
        "layers": layers,
        "norm": {"weight": np.ones(h, np.float32)},
    }
    if task == "lm":
        params["lm_head"] = {"weight": w(v, h)}
    else:
        params["score"] = {"weight": w(config.num_labels, h)}
    return params


def init_opt_params(config, task: str = "lm", seed: int = 0) -> dict:
    """Random-init OPT pytree (tests / drivers / QAT-from-scratch) —
    mirrors ``opt_params_from_flat``'s tree."""
    rng = np.random.default_rng(seed)
    h, ffn, v = config.hidden_size, config.ffn_dim, config.vocab_size

    def w(*shape, scale=0.02):
        # direct f32 generation: the f64 path generated 27GB of doubles for a
        # 7B init (444s of the 1500s bench budget on this box)
        return rng.standard_normal(shape, dtype=np.float32) * np.float32(scale)

    def lin(out, inp):
        return {"weight": w(out, inp), "bias": np.zeros(out, np.float32)}

    def ln(d):
        return {"weight": np.ones(d, np.float32), "bias": np.zeros(d, np.float32)}

    layers = []
    for _ in range(config.num_hidden_layers):
        layers.append(
            {
                "self_attn": {
                    n: lin(h, h) for n in ("q_proj", "k_proj", "v_proj", "out_proj")
                },
                "self_attn_layer_norm": ln(h),
                "fc1": lin(ffn, h),
                "fc2": lin(h, ffn),
                "final_layer_norm": ln(h),
            }
        )
    params = {
        "embed_tokens": {"weight": w(v, config.word_embed_proj_dim)},
        # +2 offset rows (reference OPTLearnedPositionalEmbedding, :115)
        "embed_positions": {"weight": w(config.max_position_embeddings + 2, h)},
        "layers": layers,
        "final_layer_norm": ln(h),
    }
    if task == "cls":
        params["score"] = {"weight": w(config.num_labels, config.word_embed_proj_dim)}
    elif task == "qa":
        params["qa_outputs"] = lin(2, config.word_embed_proj_dim)
    return params


def init_bert_params(config, task: str = "cls", seed: int = 0) -> dict:
    """Random-init BERT pytree — mirrors ``bert_params_from_flat``'s tree."""
    rng = np.random.default_rng(seed)
    h, inter, v = config.hidden_size, config.intermediate_size, config.vocab_size

    def w(*shape, scale=0.02):
        # direct f32 generation: the f64 path generated 27GB of doubles for a
        # 7B init (444s of the 1500s bench budget on this box)
        return rng.standard_normal(shape, dtype=np.float32) * np.float32(scale)

    def lin(out, inp):
        return {"weight": w(out, inp), "bias": np.zeros(out, np.float32)}

    def ln(d):
        return {"weight": np.ones(d, np.float32), "bias": np.zeros(d, np.float32)}

    layers = []
    for _ in range(config.num_hidden_layers):
        layers.append(
            {
                "attention": {
                    "query": lin(h, h),
                    "key": lin(h, h),
                    "value": lin(h, h),
                    "output": {"dense": lin(h, h), "LayerNorm": ln(h)},
                },
                "intermediate": {"dense": lin(inter, h)},
                "output": {"dense": lin(h, inter), "LayerNorm": ln(h)},
            }
        )
    params = {
        "embeddings": {
            "word_embeddings": {"weight": w(v, h)},
            "position_embeddings": {"weight": w(config.max_position_embeddings, h)},
            "token_type_embeddings": {"weight": w(config.type_vocab_size, h)},
            "LayerNorm": ln(h),
        },
        "layers": layers,
        "pooler": {"dense": lin(h, h)},
    }
    if task == "cls":
        params["classifier"] = lin(config.num_labels, h)
    elif task in ("mlm", "clm", "pretrain", "nsp"):
        # BertLMPredictionHead: transform + tied decoder + bias
        cls = {
            "transform": {"dense": lin(h, h), "LayerNorm": ln(h)},
            "bias": np.zeros(v, np.float32),
        }
        if task in ("pretrain", "nsp"):
            cls["seq_relationship"] = lin(2, h)
        params["cls"] = cls
    elif task == "qa":
        params["qa_outputs"] = lin(2, h)
    elif task == "token":
        params["classifier"] = lin(config.num_labels, h)
    elif task == "mc":
        params["classifier"] = lin(1, h)
    return params


# ---------------------------------------------------------------- opt


def opt_params_from_flat(flat: dict, config, task: str = "lm") -> dict:
    flat = _normalize(flat)
    pre = ""
    for cand in ("model.decoder.", "decoder.", ""):
        if any(k.startswith(cand + "embed_tokens.") for k in flat):
            pre = cand
            break
    layers = []
    for i in range(config.num_hidden_layers):
        lp = f"{pre}layers.{i}."
        layers.append(
            {
                "self_attn": {
                    n: _linear(flat, lp + f"self_attn.{n}")
                    for n in ("q_proj", "k_proj", "v_proj", "out_proj")
                },
                "self_attn_layer_norm": _linear(flat, lp + "self_attn_layer_norm"),
                "fc1": _linear(flat, lp + "fc1"),
                "fc2": _linear(flat, lp + "fc2"),
                "final_layer_norm": _linear(flat, lp + "final_layer_norm"),
            }
        )
    params = {
        "embed_tokens": {"weight": _leaf(flat, pre + "embed_tokens.weight")},
        "embed_positions": {"weight": _leaf(flat, pre + "embed_positions.weight")},
        "layers": layers,
    }
    fln = _leaf(flat, pre + "final_layer_norm.weight", required=False)
    if fln is not None:
        params["final_layer_norm"] = _linear(flat, pre + "final_layer_norm")
    for proj in ("project_in", "project_out"):
        w = _leaf(flat, pre + f"{proj}.weight", required=False)
        if w is not None:
            params[proj] = {"weight": w}
    if task == "lm":
        lm = _leaf(flat, "lm_head.weight", required=False)
        if lm is not None and not config.tie_word_embeddings:
            params["lm_head"] = {"weight": lm}
    elif task == "cls":
        score = _leaf(flat, "score.weight", required=False)
        params["score"] = {
            "weight": score
            if score is not None
            else np.zeros(
                (config.num_labels, config.word_embed_proj_dim), np.float32
            )
        }
    elif task == "qa":
        params["qa_outputs"] = _linear(flat, "qa_outputs")
    return params


# ---------------------------------------------------------------- bert


def bert_params_from_flat(flat: dict, config, task: str = "cls") -> dict:
    flat = _normalize(flat)
    pre = "bert." if any(k.startswith("bert.") for k in flat) else ""
    emb = pre + "embeddings."
    params = {
        "embeddings": {
            "word_embeddings": {"weight": _leaf(flat, emb + "word_embeddings.weight")},
            "position_embeddings": {
                "weight": _leaf(flat, emb + "position_embeddings.weight")
            },
            "token_type_embeddings": {
                "weight": _leaf(flat, emb + "token_type_embeddings.weight")
            },
            "LayerNorm": _linear(flat, emb + "LayerNorm"),
        },
        "layers": [],
    }
    for i in range(config.num_hidden_layers):
        lp = f"{pre}encoder.layer.{i}."
        params["layers"].append(
            {
                "attention": {
                    "query": _linear(flat, lp + "attention.self.query"),
                    "key": _linear(flat, lp + "attention.self.key"),
                    "value": _linear(flat, lp + "attention.self.value"),
                    "output": {
                        "dense": _linear(flat, lp + "attention.output.dense"),
                        "LayerNorm": _linear(flat, lp + "attention.output.LayerNorm"),
                    },
                },
                "intermediate": {"dense": _linear(flat, lp + "intermediate.dense")},
                "output": {
                    "dense": _linear(flat, lp + "output.dense"),
                    "LayerNorm": _linear(flat, lp + "output.LayerNorm"),
                },
            }
        )
    pooler_w = _leaf(flat, pre + "pooler.dense.weight", required=False)
    if pooler_w is not None:
        params["pooler"] = {"dense": _linear(flat, pre + "pooler.dense")}
    if task == "cls":
        cls_w = _leaf(flat, "classifier.weight", required=False)
        if cls_w is not None:
            params["classifier"] = _linear(flat, "classifier")
        else:
            params["classifier"] = {
                "weight": np.zeros((config.num_labels, config.hidden_size), np.float32),
                "bias": np.zeros((config.num_labels,), np.float32),
            }
    return params
