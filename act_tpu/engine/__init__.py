from act_tpu.engine.builder import (build_optimizer, build_schedule,
                                    dataset_builder, weight_decay_mask,
                                    freeze_mask_from_paths)
from act_tpu.engine.train_state import (TrainState, make_pretrain_step,
                                        make_autoencoder_step,
                                        make_finetune_step, step_rngs)
from act_tpu.engine import checkpoint
