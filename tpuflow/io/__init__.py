from tpuflow.io.flo import read_flo, write_flo
from tpuflow.io.image import read_image, write_image, write_pgm, read_pgm
