from attention_based_e2e_asr_dnn_tpu.training.loss import masked_ce_loss  # noqa: F401
from attention_based_e2e_asr_dnn_tpu.training.optim import (  # noqa: F401
    build_optimizer,
    CosineWarmupSchedule,
    ReduceLROnPlateau,
    TeacherForcingScheduler,
    DropoutScheduler,
)
from attention_based_e2e_asr_dnn_tpu.training.steps import (  # noqa: F401
    TrainState,
    make_train_step,
    make_eval_step,
    create_train_state,
)
from attention_based_e2e_asr_dnn_tpu.training.checkpoints import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    average_checkpoints,
)
from attention_based_e2e_asr_dnn_tpu.training.trainer import Trainer  # noqa: F401
