from cermvs_tpu.training.loss import sequence_loss
from cermvs_tpu.training.optim import fetch_optimizer, one_cycle_linear
from cermvs_tpu.training.step import (
    TrainState, disp_ground_truth, init_state, make_train_step, shard_batch,
)
