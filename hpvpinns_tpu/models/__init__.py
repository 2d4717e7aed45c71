from hpvpinns_tpu.models.mlp import MLP, init_mlp, mlp_apply
