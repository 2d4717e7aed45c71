from hpvpinns_tpu.spectral.jacobi import jacobi, jacobi_all, djacobi
from hpvpinns_tpu.spectral.quadrature import (
    gauss_jacobi,
    gauss_lobatto_jacobi,
)
from hpvpinns_tpu.spectral.basis import TestBasis, make_test_basis
