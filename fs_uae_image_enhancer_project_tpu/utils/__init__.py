from .profiler import BenchResult, measure, measure_donated  # noqa: F401
