from .build import (build_dataset, make_data_loader, make_data_loader_da,
                    prestage_datasets)

__all__ = ["make_data_loader", "make_data_loader_da", "build_dataset",
           "prestage_datasets"]
