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
        if self.model.config.image_size != 224:
            # crop geometry is fixed at the CLIP input resolution, like
            # the reference's transforms (oadp/oake/objects.py:116-127)
            raise ValueError(
                'the objects pipeline requires a 224px CLIP '
                f'(got image_size={self.model.config.image_size}); '
                'shrink width/layers/heads instead for smoke runs'
            )
        self.mini_batch_size = int(self.config.get('mini_batch_size', 512))
        self.expand_mode = str(self.config.get('expand_mode', 'ADAPTIVE'))
        self._buckets = tuple(
            b for b in BUCKETS if b <= self.mini_batch_size
        ) or (self.mini_batch_size,)
        # Tap-count buckets for the compact resample coefficients; the
        # worst case is a sqrt(8)-expanded whole-image proposal.
        k_max = P.coeff_ksize(np.sqrt(8.0) * self.pad)
        self._k_buckets = tuple(
            k for k in (5, 9, 13, 21, 33, 49) if k < k_max
        ) + (k_max,)

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
        keep = np.nonzero(B.filter_min_wh(proposals, 4, 4))[0]
        if Store.DRY_RUN:
            keep = keep[:5]  # first 5 FILTERED (reference objects.py:166-167)
        proposals = proposals[keep]
        objectness = objectness[keep]
        if len(proposals) == 0:
            return None

        crops = B.expand_boxes(proposals, w, h, self.expand_mode)
        foregrounds = proposals - np.concatenate(
            [crops[:, :2], crops[:, :2]], axis=-1
        )
        masks = B.grid_mask(foregrounds, crops, self.model.grid)

        # Per-crop scalar metadata; tap weights are derived on device
        # (``ops/preprocess.device_coeffs``). The tap count is bucketed
        # so XLA compiles a handful of shapes.
        meta = P.clip_transform_meta(w, h, crops)
        scale = np.maximum(
            np.maximum(meta[:, 2] / meta[:, 4], meta[:, 3] / meta[:, 5]),
            1.0,
        )
        ksizes = 2 * np.ceil(2.0 * scale).astype(int) + 1
        k = bucket(int(ksizes.max()), self._k_buckets)

        # Pad to buckets AND ship everything to the device HERE, in the
        # producer thread: the host->device transfer (~2 MB/image, tens
        # of ms on a tunneled backend) then overlaps the previous
        # image's encoder instead of blocking the dispatch thread.
        # Masks travel as uint8 (4x fewer bytes; cast on device).
        import jax
        grid = self.model.grid
        pad_meta = np.asarray(
            [0, 0, 224, 224, 224, 224, 0, 0, 1], np.float32
        )  # dummy-but-valid identity-crop meta for padded rows
        n = len(proposals)
        chunks = []
        for start in range(0, n, self.mini_batch_size):
            stop = min(start + self.mini_batch_size, n)
            m = stop - start
            b = bucket(m, self._buckets)
            meta_pad = np.tile(pad_meta, (b, 1))
            masks_pad = np.zeros((b, grid, grid), np.uint8)
            meta_pad[:m] = meta[start:stop]
            masks_pad[:m] = masks[start:stop].astype(np.uint8)
            chunks.append((
                jax.device_put(meta_pad), jax.device_put(masks_pad), m
            ))
        return dict(
            output=item['output'],
            image=jax.device_put(self._pad_image(item['image'])),
            chunks=chunks,
            k=k,
            bboxes=proposals,
            objectness=objectness,
        )

    def execute_batch(self, prepared: list[dict[str, Any]]) -> list[Any]:
        (item,) = prepared
        # async dispatch of all mini-batches; fetch happens one image
        # later in finalize() so device compute overlaps host IO
        chunks = [
            (self.steps.objects_step(item['image'], meta, masks,
                                     item['k']), m)
            for meta, masks, m in item['chunks']
        ]
        return [
            dict(
                _chunks=chunks,
                bboxes=item['bboxes'].astype(np.float16),
                objectness=item['objectness'].astype(np.float16),
            )
        ]

    def finalize(self, record: dict[str, Any]) -> dict[str, Any]:
        chunks = record.pop('_chunks')
        # fetch each chunk WHOLE and slice in numpy: a device-side
        # emb[:m] is an extra dispatch + uncached fetch per chunk
        record['embeddings'] = np.concatenate(
            [np.asarray(emb)[:m] for emb, m in chunks]
        ).astype(np.float16)
        return record


def main(argv=None):
    return ObjectsPipeline.main(argv)


if __name__ == '__main__':
    main()
