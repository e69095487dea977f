"""OAKE objects: masked attention-pool CLIP embeddings on proposals —
the computational hot spot of the whole system (reference
``oadp/oake/objects.py``; SURVEY.md §3.1). Output per image:
``dict(embeddings=(N,512), bboxes=(N,4), objectness=(N,1))`` fp16.

TPU redesign:

* proposal crops (ADAPTIVE square expansion, PIL-exact crop+resize) are
  computed on-device from per-crop resample weight matrices;
* background masks on the 14×14 patch grid are closed-form on the host
  (``ops/boxes.grid_mask``) — no full-resolution mask images;
* the masked attention-pool dual stream is an explicit model
  (``models/clip.image_encoder_surgery``), not forward hooks;
* crop batches are padded to power-of-two buckets so XLA compiles a
  handful of shapes instead of one per proposal count.
"""

__all__ = ['ObjectsPipeline', 'main']

import pickle
from typing import Any

import numpy as np

from ..ops import boxes as B
from ..ops import preprocess as P
from ..utils import Store
from .base import BUCKETS, BaseOakePipeline, CocoImageSet, bucket


class ObjectsPipeline(BaseOakePipeline):

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.mini_batch_size = int(self.config.get('mini_batch_size', 512))
        self.expand_mode = str(self.config.get('expand_mode', 'ADAPTIVE'))
        self._buckets = tuple(
            b for b in BUCKETS if b <= self.mini_batch_size
        ) or (self.mini_batch_size,)

    def dataset_kwargs(self, ds_cfg) -> dict[str, Any]:
        with open(ds_cfg.proposal_file, 'rb') as f:
            proposals = pickle.load(f)
        dataset = self._dataset
        ids = (
            dataset.ids
            if ds_cfg.get('proposal_sorted', True) else dataset.unsorted_ids
        )
        return dict(
            proposals={
                id_: np.asarray(p, np.float32)
                for id_, p in zip(ids, proposals)
            }
        )

    def build_dataset(self, dataset_cfg) -> CocoImageSet:
        self._dataset = super().build_dataset(dataset_cfg)
        return self._dataset

    def prepare(self, item: dict[str, Any]) -> dict[str, Any] | None:
        w, h = item['width'], item['height']
        raw = item['proposals'].get(item['id'])
        if raw is None or len(raw) == 0:
            return None
        proposals, objectness = raw[:, :4], raw[:, 4:5]
        keep = B.filter_min_wh(proposals, 4, 4)
        if Store.DRY_RUN:
            keep[5:] = False  # reference objects.py:166-167
        proposals = proposals[keep]
        objectness = objectness[keep]
        if len(proposals) == 0:
            return None

        crops = B.expand_boxes(proposals, w, h, self.expand_mode)
        foregrounds = proposals - np.concatenate(
            [crops[:, :2], crops[:, :2]], axis=-1
        )
        masks = B.grid_mask(foregrounds, crops, self.model.grid)

        n = len(proposals)
        wx = np.zeros((n, 224, self.pad), np.float32)
        wy = np.zeros((n, 224, self.pad), np.float32)
        for i in range(n):
            wx[i], wy[i] = P.clip_transform_matrices(
                w, h, tuple(crops[i]), self.pad, self.pad
            )
        return dict(
            output=item['output'],
            image=self._pad_image(item['image']),
            wx=wx,
            wy=wy,
            masks=masks,
            bboxes=proposals,
            objectness=objectness,
        )

    def execute_batch(self, prepared: list[dict[str, Any]]) -> list[Any]:
        (item,) = prepared
        n = len(item['bboxes'])
        out = np.empty(
            (n, self.model.surgery_config.output_dim), np.float32
        )
        grid = self.model.grid
        for start in range(0, n, self.mini_batch_size):
            stop = min(start + self.mini_batch_size, n)
            m = stop - start
            b = bucket(m, self._buckets)
            wx = np.zeros((b, 224, self.pad), np.float32)
            wy = np.zeros((b, 224, self.pad), np.float32)
            masks = np.zeros((b, grid, grid), np.float32)
            wx[:m] = item['wx'][start:stop]
            wy[:m] = item['wy'][start:stop]
            masks[:m] = item['masks'][start:stop]
            emb = self.steps.objects_step(item['image'], wx, wy, masks)
            out[start:stop] = np.asarray(emb[:m])
        return [
            dict(
                embeddings=out.astype(np.float16),
                bboxes=item['bboxes'].astype(np.float16),
                objectness=item['objectness'].astype(np.float16),
            )
        ]


def main(argv=None):
    return ObjectsPipeline.main(argv)


if __name__ == '__main__':
    main()
