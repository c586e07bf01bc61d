from .smoothers import Smoother, make_smoother
from .hierarchy import Hierarchy, Level, CoarseSolve, build_hierarchy
from .krylov import bicgstab, cg, fcg, SolveResult
from .api import two_level_from_p, solve_hierarchy
