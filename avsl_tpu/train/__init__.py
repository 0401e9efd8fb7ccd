from avsl_tpu.train.optim import (  # noqa: F401
    linear_warmup_decay,
    whisper_optimizer,
    whisper_video_projection_optimizer,
    whisper_flamingo_projection_optimizer,
    lora_optimizer,
    select_optimizer,
    label_params,
)
from avsl_tpu.train.loop import TrainState, make_train_step, make_eval_step  # noqa: F401
from avsl_tpu.train.pp import (  # noqa: F401
    shard_pp_state,
    split_whisper_encoder_params,
    whisper_encoder_pp_forward,
)
from avsl_tpu.train.checkpoints import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    restore_sharded,
    latest_step,
    all_steps,
    partial_load,
)
from avsl_tpu.train.ema import ema_update, tree_average, average_checkpoint_steps  # noqa: F401
