from hpvpinns_tpu.training.trainer import TrainResult, train
from hpvpinns_tpu.training.gauss_newton import GNResult, gauss_newton
from hpvpinns_tpu.training.ensemble import EnsembleResult, train_ensemble
from hpvpinns_tpu.training.timemarch import TimeMarchResult, time_march
