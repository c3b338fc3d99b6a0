"""llm_mixed_q_tpu — TPU-native mixed-precision quantization framework for LLMs.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
framework llm-mixed-q (EMNLP 2023, "Revisiting Block-based Quantisation"):
7 quantization arithmetics, quantized BERT/OPT/Llama, statistic profiling,
per-layer mixed-precision search, PTQ/QAT, plus a TPU-native tier the
reference only simulates: packed sub-8-bit storage and fused Pallas
dequant-matmul kernels, sharded over device meshes with pjit.

Reference parity map: see SURVEY.md at the repo root. Individual modules cite
the reference files (file:line) whose behavior they reproduce.
"""

__version__ = "0.1.0"
