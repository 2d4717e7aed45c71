from hpvpinns_tpu.ops.derivatives import (
    value_and_dir_derivs2,
    dir_deriv,
)
from hpvpinns_tpu.ops.contract import (
    contract_1d,
    contract_2d,
)
