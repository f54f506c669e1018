from attention_based_e2e_asr_dnn_tpu.utils.levenshtein import (  # noqa: F401
    levenshtein,
    batch_levenshtein,
    ids_to_str,
)
