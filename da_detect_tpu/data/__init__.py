from .build import make_data_loader, make_data_loader_da, build_dataset

__all__ = ["make_data_loader", "make_data_loader_da", "build_dataset"]
