from tpuflow.ops.gradients import (
    centered_gradient,
    centered_gradient3,
    divergence,
    dxx,
    dxy,
    dyy,
    forward_gradient,
    mask3x3,
)
from tpuflow.ops.gaussian import gaussian, gaussian_kernel_1d, sepconvol, sgauss_kernel
from tpuflow.ops.interp import (bicubic_at, image_restriction,
                                interpolate_bilinear, warp,
                                warp_planes, warp_stack)
from tpuflow.ops.median import median_filter
from tpuflow.ops.normalize import normalize_joint
from tpuflow.ops.pyramid import (
    clamp_nscales,
    pyramid_sizes,
    zoom_in,
    zoom_out,
    zoom_size,
)
