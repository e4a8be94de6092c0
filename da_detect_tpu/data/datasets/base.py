"""Dataset base protocol + path-list dataset.

TPU-native equivalents of the reference's two small dataset helpers:

* ``AbstractDataset`` (reference data/datasets/abstract.py:1-69) — there it
  is a torch ``Dataset`` ABC documenting the (img, BoxList, idx) contract.
  Here the contract is the *host-sample dict* every dataset returns to the
  fixed-shape loader (see coco.py::COCODataset.sample), so the base class
  documents and type-checks that dict instead. ``init_maps`` mirrors the
  reference's ``initMaps`` class<->index mapping (abstract.py:38-60),
  including the background-at-0 invariant.
* ``ListDataset`` (reference data/datasets/list_dataset.py:11-36) — wraps a
  plain list of image paths with a dummy whole-image target; used for
  label-free batch inference over a folder of images (demo/test_net on raw
  images).
"""

from __future__ import annotations

import os

import numpy as np

# fields every host sample must carry for the fixed-shape loader
SAMPLE_FIELDS = ("path", "image_id", "width", "height", "boxes", "labels",
                 "is_source")


class AbstractDataset:
    """Common interface for host-side datasets.

    A dataset must implement ``__len__``, ``get_img_info(index) -> dict``
    (at least width/height, WITHOUT decoding the image — the aspect-ratio
    bucketing sampler calls it for every record up front), and
    ``sample(index) -> dict`` with the ``SAMPLE_FIELDS`` keys: numpy
    ``boxes [N,4]`` xyxy, ``labels [N]`` contiguous ints (background=0),
    and the per-dataset DA domain flag ``is_source``.
    """

    CLASSES: tuple = ()

    def __init__(self):
        self.name_to_id = None
        self.id_to_name = None

    def init_maps(self):
        """Build class-name<->index maps (reference abstract.py:38-60);
        index 0 must be ``__background__``."""
        assert isinstance(self.CLASSES, (list, tuple)) and self.CLASSES
        assert self.CLASSES[0] == "__background__"
        self.name_to_id = {c: i for i, c in enumerate(self.CLASSES)}
        self.id_to_name = {i: c for i, c in enumerate(self.CLASSES)}

    def __len__(self):
        raise NotImplementedError

    def get_img_info(self, index):
        raise NotImplementedError

    def sample(self, index):
        raise NotImplementedError


class ListDataset(AbstractDataset):
    """Wraps a list of image paths for label-free inference
    (reference list_dataset.py:11-36). The dummy target is the whole-image
    box, matching the reference's ``BoxList([[0, 0, w, h]])``."""

    def __init__(self, image_paths, is_source: bool = True):
        super().__init__()
        self.image_paths = list(image_paths)
        self.is_source = is_source
        self._sizes = [None] * len(self.image_paths)

    def __len__(self):
        return len(self.image_paths)

    def _size(self, index):
        if self._sizes[index] is None:
            from PIL import Image
            with Image.open(self.image_paths[index]) as im:
                self._sizes[index] = im.size  # (w, h)
        return self._sizes[index]

    def get_img_info(self, index):
        w, h = self._size(index)
        return dict(id=index, width=w, height=h,
                    file_name=os.path.basename(self.image_paths[index]))

    def sample(self, index):
        w, h = self._size(index)
        return dict(
            path=self.image_paths[index],
            image_id=index,
            width=w,
            height=h,
            boxes=np.asarray([[0.0, 0.0, w, h]], np.float32),
            labels=np.zeros((1,), np.int32),
            segmentations=[None],
            keypoints=[None],
            is_source=self.is_source,
        )
