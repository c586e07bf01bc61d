from .formats import COO, CSR, ELL
from . import ops
from . import hybrid
from .spgemm import spgemm_ell, transpose_ell
