"""TPU Pallas kernels: the windowed-gather engine."""
from .gather_pallas import (windowed_gather_spmv, windowed_take,
                            windowed_take_rows, plan_windows,
                            plan_windows_device, plan_from_minmax)
