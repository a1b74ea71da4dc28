from slowfast_vos_tpu.train.train_step import Trainer, TrainState  # noqa: F401
