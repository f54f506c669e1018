from attention_based_e2e_asr_dnn_tpu.models.las import (  # noqa: F401
    ListenerConfig,
    SpellerConfig,
    LASConfig,
    listener_init,
    listener_apply,
    speller_init,
    speller_apply,
    las_init,
    las_apply,
    las_config_from_dicts,
)
from attention_based_e2e_asr_dnn_tpu.models.rewriter import (  # noqa: F401
    RewriterConfig,
    rewriter_init,
    rewriter_apply,
)
