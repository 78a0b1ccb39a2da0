from .dataset import MultiResolutionDataset, resolve_record_dir
from .loader import DataLoader
from .prepare import prepare_data

__all__ = ["MultiResolutionDataset", "DataLoader", "prepare_data",
           "resolve_record_dir"]
