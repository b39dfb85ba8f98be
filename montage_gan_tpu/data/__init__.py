from .dataset import DatasetAIO, ImageFolderDataset, dataset_stat
from .sampler import InfiniteSampler
from .synthetic import make_synthetic_layer_dataset
