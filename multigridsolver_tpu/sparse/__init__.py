from .formats import COO, CSR, ELL
from . import ops
