"""Real 2-process jax.distributed execution (parallel/multihost_check.py).

Two local processes x 4 virtual CPU devices = a genuine JAX cluster over a
localhost coordinator; the element mesh spans both processes, so the
loss/grad all-reduce crosses the process boundary (the DCN code path of
SURVEY.md section 5).  Equality with the single-process 8-device run proves
the layout.
"""

import pytest

from hpvpinns_tpu.parallel.multihost_check import (
    assert_multiprocess_matches,
    run_multiprocess_check,
)


@pytest.mark.slow
def test_two_process_cluster_matches_single_process():
    result = run_multiprocess_check()
    assert_multiprocess_matches(result)
    # Both children actually ran as distinct cluster members.
    idx = sorted(c["process_index"] for c in result["children"])
    assert idx == [0, 1]
