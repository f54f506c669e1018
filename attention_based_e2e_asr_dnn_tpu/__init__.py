"""attention_based_e2e_asr_dnn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework
with the capabilities of the reference LAS (Listen-Attend-Spell) ASR stack.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

  constants     30-symbol character vocabulary (reference: src/constants.py:6-19)
  config        YAML -> attribute-tree config with `configs`-splat semantics and
                config.json snapshot round-trip (reference: src/utils.py:23-32)
  data          .npy feature/transcript loaders, length-bucketed static-shape
                batching, on-device SpecAugment (reference: src/utils.py:36-290)
  ops           masked lax.scan LSTM stacks + Pallas fused kernels, locked
                dropout, pyramidal time pooling, cross-attention primitives
                (reference: src/modules.py, src/models.py:70-193)
  models        Listener / Speller / ListenAttendSpell and the Rewriter LM as
                functional param-pytree modules (reference: src/models.py,
                src/lmtrain.py:98-253)
  decoding      greedy scan and static-beam search with early EOS stopping
  training      functional jitted train/eval steps, optimizer/scheduler
                registry, checkpointing with best/milestone/eviction policy
                (reference: src/train.py:25-474)
  parallel      jax.sharding device mesh helpers, data-parallel pjit train
                step (new capability; reference is single-device)
  utils         Levenshtein metrics (C++ native tier + pure fallback),
                attention-map plotting, metric logging
  compat        reference-checkpoint interop: torch state_dict <-> our
                param pytrees (tools/import_reference_ckpt.py CLI)
  export        deployment export: decode graphs -> StableHLO .tlas
                artifacts, model-code-free + dp-sharded serving
                (tools/export_serving.py)
  serving       persistent Transcriber/Corrector + streaming batch queue
  server        stdlib HTTP endpoint over the streaming queue with
                health/readiness/metrics (tools/serve_http.py)

Entry points (same CLI surface as the reference):

  python -m attention_based_e2e_asr_dnn_tpu.train   -c configs/base-las.yml
  python -m attention_based_e2e_asr_dnn_tpu.infer   -c configs/infer.yml
  python -m attention_based_e2e_asr_dnn_tpu.lmtrain -c configs/rewriter.yml
  python -m attention_based_e2e_asr_dnn_tpu.lminfer -c configs/lm-infer.yml
  python -m attention_based_e2e_asr_dnn_tpu.dev     --help
"""

__version__ = "0.1.0"

from attention_based_e2e_asr_dnn_tpu.constants import (  # noqa: F401
    VOCAB,
    VOCAB_MAP,
    SOS_IDX,
    EOS_IDX,
)
