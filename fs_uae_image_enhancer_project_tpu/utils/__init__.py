from .profiler import (  # noqa: F401
    BenchResult,
    measure_chained,
    measure_roundtrip,
    trace,
)
