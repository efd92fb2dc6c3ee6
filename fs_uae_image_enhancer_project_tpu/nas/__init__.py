from .fps_cache import FPSCache  # noqa: F401
from .search import (  # noqa: F401
    COMPLETE,
    FAIL,
    PRUNED,
    MedianPruner,
    NopPruner,
    RandomSampler,
    Study,
    TPESampler,
    Trial,
    TrialPruned,
    create_study,
)
