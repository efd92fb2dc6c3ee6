from .codec import construct_filename, parse_generated_filename  # noqa: F401
from .dataset import (  # noqa: F401
    SRDataset,
    device_prefetch,
    gather_all_samples_from_directory,
    split_pairs,
)
