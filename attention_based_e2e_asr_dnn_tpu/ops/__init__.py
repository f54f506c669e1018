from attention_based_e2e_asr_dnn_tpu.ops.masking import length_mask, pad_mask  # noqa: F401
from attention_based_e2e_asr_dnn_tpu.ops.dropout import locked_dropout, dropout  # noqa: F401
from attention_based_e2e_asr_dnn_tpu.ops.lstm import (  # noqa: F401
    lstm_init,
    lstm_apply,
    bilstm_apply,
    locked_lstm_stack_init,
    locked_lstm_stack_apply,
    pyramidal_lstm_stack_init,
    pyramidal_lstm_stack_apply,
    lstm_cell_init,
    lstm_cell_step,
)
from attention_based_e2e_asr_dnn_tpu.ops.attention import (  # noqa: F401
    cross_attention_init,
    cross_attention_precompute,
    cross_attention_step,
)
