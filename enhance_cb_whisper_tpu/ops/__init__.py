from .sim import l2_normalize, sim_matrix, cossim_matmul
from .resize import resize_bilinear, resize_matrix

__all__ = [
    "l2_normalize",
    "sim_matrix",
    "cossim_matmul",
    "resize_bilinear",
    "resize_matrix",
]
