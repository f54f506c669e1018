from attention_based_e2e_asr_dnn_tpu.decoding.beam import (  # noqa: F401
    beam_search,
    make_las_beam_step,
    make_rewriter_beam_step,
)
from attention_based_e2e_asr_dnn_tpu.decoding.greedy import (  # noqa: F401
    greedy_decode_early_stop,
    make_las_greedy_step,
)
