from .prolongation import (prolong, restrict, labels_from_p_csr,
                           p_csr_from_labels, compose_labels)
from .galerkin import galerkin_dense, galerkin_ell
