from tpuflow.io.flo import (read_flo, read_flow, read_juv, write_flo,
                            write_flow, write_juv)
from tpuflow.io.image import read_image, write_image, write_pgm, read_pgm
