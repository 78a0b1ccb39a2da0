from .dataset import MultiResolutionDataset
from .loader import DataLoader
from .prepare import prepare_data

__all__ = ["MultiResolutionDataset", "DataLoader", "prepare_data"]
