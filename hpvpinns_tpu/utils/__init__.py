from hpvpinns_tpu.utils.sampling import latin_hypercube
