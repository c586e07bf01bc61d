from .prolongation import (prolong, restrict, labels_from_p_csr,
                           p_csr_from_labels, compose_labels)
from .galerkin import galerkin_dense, galerkin_ell
from .strength import compute_strength, StrengthData
from .matching import mutual_match, labels_from_pairs, greedy_match_host
from .aggregation import (pairwise_aggregate, build_amg_setup,
                          refresh_setup, AggregationResult, SetupResult)
from .transfers import (TransferPlan, build_transfer_plan,
                        build_transfer_plan_from_p)
from .smoothed import smoothed_prolongation, galerkin_general
from .tentagg import checktentagg
