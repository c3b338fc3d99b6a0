"""Model registry.

Reference: src/llm_mixed_q/models/__init__.py:26-121 — 8 maps keyed by arch
(bert/llama/opt) with ``get_*`` accessors. Functional equivalents here: apply
functions instead of nn.Module classes, param loaders instead of
``from_pretrained``, PTQ preparers instead of in-place first-forward
quantization. BERT has no ``lm`` task (as in the reference).
"""

from __future__ import annotations

from .bert import (
    BertQuantizedConfig,
    bert_for_masked_lm,
    bert_for_multiple_choice,
    bert_for_next_sentence_prediction,
    bert_for_pretraining,
    bert_for_question_answering,
    bert_for_sequence_classification,
    bert_for_token_classification,
    bert_lm_head_model,
    format_stat_profiled_int_config_bert_quantized,
    parse_bert_quantized_config,
    quantize_bert_params_ptq,
)
from .hf_loader import (
    bert_params_from_flat,
    llama_params_from_flat,
    load_flat_state_dict,
    opt_params_from_flat,
)
from .llama import (
    LlamaQuantizedConfig,
    format_stat_profiled_int_config_llama_quantized,
    llama_for_causal_lm,
    llama_for_sequence_classification,
    parse_llama_quantized_config,
    quantize_llama_params_ptq,
)
from .opt import (
    OPTQuantizedConfig,
    format_stat_profiled_int_config_opt_quantized,
    opt_for_causal_lm,
    opt_for_question_answering,
    opt_for_sequence_classification,
    parse_opt_quantized_config,
    quantize_opt_params_ptq,
)
from ..costmodel.models import (
    profile_bert_quantized,
    profile_llama_quantized,
    profile_opt_quantized,
)

MODEL_FN_MAP = {
    "bert": {
        "cls": bert_for_sequence_classification,
        # reference modeling_bert.py:1226-2064 task heads
        "mlm": bert_for_masked_lm,
        "clm": bert_lm_head_model,
        "nsp": bert_for_next_sentence_prediction,
        "pretrain": bert_for_pretraining,
        "mc": bert_for_multiple_choice,
        "token": bert_for_token_classification,
        "qa": bert_for_question_answering,
    },
    "llama": {"cls": llama_for_sequence_classification, "lm": llama_for_causal_lm},
    "opt": {
        "cls": opt_for_sequence_classification,
        "lm": opt_for_causal_lm,
        "qa": opt_for_question_answering,
    },
}

CONFIG_MAP = {
    "bert": BertQuantizedConfig,
    "llama": LlamaQuantizedConfig,
    "opt": OPTQuantizedConfig,
}

PARAMS_LOADER_MAP = {
    "bert": bert_params_from_flat,
    "llama": llama_params_from_flat,
    "opt": opt_params_from_flat,
}

PTQ_PREPARE_MAP = {
    "bert": quantize_bert_params_ptq,
    "llama": quantize_llama_params_ptq,
    "opt": quantize_opt_params_ptq,
}

PROFILER_MAP = {
    "bert": profile_bert_quantized,
    "llama": profile_llama_quantized,
    "opt": profile_opt_quantized,
}

QUANT_CONFIG_PARSER_MAP = {
    "bert": parse_bert_quantized_config,
    "llama": parse_llama_quantized_config,
    "opt": parse_opt_quantized_config,
}

STAT_CONFIG_FORMATTER_MAP = {
    "bert": format_stat_profiled_int_config_bert_quantized,
    "llama": format_stat_profiled_int_config_llama_quantized,
    "opt": format_stat_profiled_int_config_opt_quantized,
}


def _get(map_, arch, task=None):
    assert arch in map_, f"Unknown arch: {arch} (available: {list(map_)})"
    entry = map_[arch]
    if task is None:
        return entry
    assert task in entry, f"Arch {arch} does not support task {task}"
    return entry[task]


def get_model_fn(arch: str, task: str):
    return _get(MODEL_FN_MAP, arch, task)


def get_config_cls(arch: str):
    return _get(CONFIG_MAP, arch)


def get_params_loader(arch: str):
    return _get(PARAMS_LOADER_MAP, arch)


def get_ptq_preparer(arch: str):
    return _get(PTQ_PREPARE_MAP, arch)


def get_params_packer(arch: str):
    """Packed-storage converter (bit-packed/int8 BFP weights + fused kernel
    serving) — the physical-storage upgrade over the reference's fake-quant
    is_ptq mode (reference linear.py:63-71)."""
    from .bert.pack import pack_bert_params
    from .llama.pack import pack_llama_params
    from .opt.pack import pack_opt_params

    return _get(
        {"llama": pack_llama_params, "opt": pack_opt_params, "bert": pack_bert_params},
        arch,
    )


def get_model_profiler(arch: str):
    return _get(PROFILER_MAP, arch)


def get_quant_config_parser(arch: str):
    return _get(QUANT_CONFIG_PARSER_MAP, arch)


def get_stat_config_formatter(arch: str):
    return _get(STAT_CONFIG_FORMATTER_MAP, arch)


def get_tokenizer_cls(arch: str):
    """HF tokenizer classes (reference models/__init__.py TOKENIZER_MAP)."""
    from transformers import AutoTokenizer

    return AutoTokenizer


def get_quant_config_sampler(arch: str):
    from ..search.samplers_model import get_model_sampler

    return get_model_sampler(arch)
