from .config import (AggregationConfig, HierarchyConfig, SmootherConfig,
                     SolveConfig)
from .timing import PhaseTimer, print_info, print_warn
