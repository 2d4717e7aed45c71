from hpvpinns_tpu.training.trainer import TrainResult, train
