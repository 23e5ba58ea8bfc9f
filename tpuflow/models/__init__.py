from tpuflow.models.brox_spatial import brox_scale, brox_spatial
from tpuflow.models.brox_temporal import brox_temporal, brox_temporal_scale
from tpuflow.models.hs_classic import hs_classic, hs_classic_jit
from tpuflow.models.hs_pyramidal import hs_pyramidal, hs_scale
from tpuflow.models.robust_expo import robust_expo, robust_expo_scale
from tpuflow.models.tvl1 import tvl1_multiscale, tvl1_scale
from tpuflow.models.tvl1occflow import tvl1occ_scale, tvl1occflow
