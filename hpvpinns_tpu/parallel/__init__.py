from hpvpinns_tpu.parallel.sharding import (
    element_mesh,
    pad_elements,
    replicate,
    shard_problem,
)
