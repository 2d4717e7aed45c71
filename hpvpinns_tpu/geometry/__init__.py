from hpvpinns_tpu.geometry.mesh import Interval1D, TensorMesh2D, uniform_grid
