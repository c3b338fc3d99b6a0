"""Generalized prompting-eval registry (reference model_wrapper.py:16-176 /
evaluate_prompting.py:16-59 features): per-example choices, winogrande-style
context-choice tasks, k-shot prefixes, generation tasks, auto batch size,
acc_norm — all driven offline with synthetic examples + a toy tokenizer."""

import numpy as np
import pytest

import jax

from llm_mixed_q_tpu.eval.prompting import (
    TASK_TEMPLATES,
    eval_prompting_task,
    eval_prompting_tasks,
    greedy_until,
    make_fewshot_prefix,
    register_task,
)
from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama import (
    LlamaQuantizedConfig,
    llama_for_causal_lm,
)

TINY = dict(
    vocab_size=96,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    max_position_embeddings=256,
)


class ToyTokenizer:
    def __call__(self, text, add_special_tokens=True):
        ids = [1] if add_special_tokens else []
        ids += [2 + (hash(w) % 90) for w in text.split()]
        return {"input_ids": ids}

    def decode(self, ids):
        return " ".join(f"t{i}" for i in ids)


@pytest.fixture(scope="module")
def model():
    config = LlamaQuantizedConfig(**TINY, quant_config=None)
    params = init_llama_params(config, task="lm", seed=0)

    @jax.jit
    def fwd(p, ids, mask):
        return llama_for_causal_lm(p, ids, mask, config=config)

    return fwd, params, ToyTokenizer()


def test_registry_has_baseline_breadth():
    # VERDICT.md Next #6: >= 8 tasks from config
    assert len(TASK_TEMPLATES) >= 8
    for need in ("sst", "rte", "cola", "boolq", "piqa", "arc_easy",
                 "hellaswag", "winogrande", "lambada"):
        assert need in TASK_TEMPLATES, need


def test_per_example_choices(model):
    fwd, params, tok = model
    examples = [
        {
            "question": f"what is item {i}",
            "choices": {"text": [f"alpha {i}", f"beta {i}", f"gamma {i}"],
                        "label": ["A", "B", "C"]},
            "answerKey": "B",
        }
        for i in range(4)
    ]
    r = eval_prompting_task(fwd, params, tok, "arc_easy", examples,
                            batch_size=2)
    assert r["n"] == 4
    assert 0.0 <= r["acc"] <= 1.0
    assert 0.0 <= r["acc_norm"] <= 1.0


def test_winogrande_style(model):
    fwd, params, tok = model
    examples = [
        {
            "sentence": f"the thing {i} could not fit because _ was big",
            "option1": "the thing",
            "option2": "the box",
            "answer": "1",
        }
        for i in range(3)
    ]
    r = eval_prompting_task(fwd, params, tok, "winogrande", examples,
                            batch_size=3)
    assert r["n"] == 3


def test_fewshot_prefix_changes_context(model):
    fwd, params, tok = model
    examples = [
        {"sentence": f"sample {i} text", "label": i % 2} for i in range(6)
    ]
    prefix = make_fewshot_prefix("sst", examples, k=2)
    assert prefix.count("\n\n") == 2
    assert "Question:" in prefix
    r0 = eval_prompting_task(fwd, params, tok, "sst", examples[:3],
                             batch_size=3, num_fewshot=0)
    r2 = eval_prompting_task(fwd, params, tok, "sst", examples[:3],
                             batch_size=3, num_fewshot=2,
                             fewshot_examples=examples[3:])
    assert r0["n"] == r2["n"] == 3


def test_greedy_task(model):
    fwd, params, tok = model
    outs = greedy_until(fwd, params, tok, ["some context words"],
                        max_gen_tokens=3, stop=None)
    assert len(outs) == 1 and outs[0]
    examples = [{"text": "one two three four"}]
    r = eval_prompting_task(fwd, params, tok, "lambada", examples,
                            batch_size=1)
    assert r["n"] == 1 and r["acc"] in (0.0, 1.0)


def test_auto_batch_size(model):
    fwd, params, tok = model
    examples = [
        {"sentence": f"sample {i} text", "label": i % 2} for i in range(5)
    ]
    r = eval_prompting_task(fwd, params, tok, "sst", examples,
                            batch_size="auto")
    assert r["batch_size"] >= 1
    assert r["n"] == 5


def test_register_task_and_multi_task_mean(model):
    fwd, params, tok = model
    register_task(
        "toy_parity",
        {
            "context": lambda ex: f"value {ex['x']} parity:",
            "choices": [" even", " odd"],
            "gold": lambda ex: ex["x"] % 2,
            "dataset": (None, None, None),
        },
    )
    examples = {
        "toy_parity": [{"x": i} for i in range(4)],
        "sst": [{"sentence": f"s {i}", "label": i % 2} for i in range(4)],
    }
    out = eval_prompting_tasks(
        fwd, params, tok, ["toy_parity", "sst"], batch_size=2,
        examples_by_task=examples,
    )
    assert set(out["results"]) == {"toy_parity", "sst"}
    accs = [r["acc"] for r in out["results"].values()]
    assert abs(out["mean_acc"] - float(np.mean(accs))) < 1e-9
