from attention_based_e2e_asr_dnn_tpu.decoding.beam import (  # noqa: F401
    beam_search,
    make_las_beam_step,
    make_rewriter_beam_step,
)
