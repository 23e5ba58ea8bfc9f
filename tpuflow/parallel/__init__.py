from tpuflow.parallel.halo import exchange_1d, exchange_2d
from tpuflow.parallel.mesh import make_mesh
