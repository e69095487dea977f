"""OAKE blocks: multi-scale crop-grid CLIP embeddings (reference
``oadp/oake/blocks.py``). Output per image:
``dict(embeddings=(N,512) fp16, bboxes=(N,4) fp16)``.

TPU redesign: the whole crop pyramid for one image — every PIL
downscale level and every 224×224 block — is ONE jitted program
(``OakeSteps.blocks_step``): pyramid levels are weight-matrix resizes,
blocks are static-shape dynamic slices, and all crops are encoded in a
single ViT batch. The reference instead builds the pyramid with PIL on
the host (blocks.py:54-77, the CPU hot loop per SURVEY.md §3.1).
"""

__all__ = ['BlocksPipeline', 'main']

import functools
from typing import Any

import numpy as np

from ..ops import preprocess as P
from .base import BaseOakePipeline, bucket
from .partitions import first_block_bbox, plan_blocks


class BlocksPipeline(BaseOakePipeline):

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.block_size = int(self.config.get('block_size', 224))
        self.max_stride = int(self.config.get('max_stride', 112))
        self.rescale = float(self.config.get('rescale', 1.5))
        self.max_levels = int(self.config.get('max_levels', 6))
        self.max_blocks = int(self.config.get('max_blocks', 48))
        # images per dispatch: the per-image program is tiny (~25 crops
        # of 50 tokens) and dispatch-bound, so batch wide — measured
        # 219 -> 305+ img/s going 8 -> 24 on v5e. Per-size constants
        # are per-ITEM inputs so mixed sizes share one compiled program
        self.device_batch = int(self.config.get('batch_size', 24))
        # flat-block bucket sizes (one compilation each); COCO batches
        # of 24 landscape/portrait images land in the 576-768 range
        self.block_buckets = tuple(self.config.get(
            'block_buckets',
            (16, 32, 64, 96, 128, 160, 192, 224, 256, 320, 384,
             448, 512, 576, 640, 704, 768, 896, 1024, 1152),
        ))

    @functools.lru_cache(maxsize=64)
    def _size_constants(self, w: int, h: int):
        """Per-image-size device constants. COCO sizes repeat heavily
        (640x480 alone is ~half the dataset), so the pyramid resize
        matrices and whole-image weights are built and transferred once
        per distinct (w, h) and kept on device."""
        import jax

        plan = plan_blocks(
            w, h, self.block_size, self.max_stride, self.rescale
        )
        n_blocks = len(plan.blocks)
        if n_blocks > self.max_blocks:
            raise ValueError(
                f'image {w}x{h} yields {n_blocks} blocks > '
                f'max_blocks={self.max_blocks}; raise .max_blocks'
            )
        n_levels = len(plan.levels) - 1
        if n_levels > self.max_levels:
            raise ValueError(
                f'{n_levels} pyramid levels > max_levels={self.max_levels}'
            )

        pad = self.pad
        level_wx = np.zeros((self.max_levels, pad, pad), np.float32)
        level_wy = np.zeros((self.max_levels, pad, pad), np.float32)
        for k in range(n_levels):
            w0, h0 = plan.levels[k]
            w1, h1 = plan.levels[k + 1]
            mx, my = P.plain_resize_matrices(w0, h0, w1, h1, pad, pad)
            level_wx[k, :w1] = mx
            level_wy[k, :h1] = my

        # host-side (level, y, x) per real block: flattened across the
        # batch (with an image index) at execute time, so the ViT batch
        # carries no per-image max_blocks padding
        coords = np.asarray(
            [(lv, y, x) for lv, x, y in plan.blocks], np.int32
        ).reshape(n_blocks, 3)

        whole_wx, whole_wy = P.clip_transform_matrices(w, h, None, pad, pad)
        bboxes = [first_block_bbox(w, h)] + plan.bboxes
        device = jax.local_devices()[0]  # per-rank constants (multi-process safe)
        arrays = jax.device_put(
            (level_wx, level_wy, whole_wx, whole_wy), device
        )
        return arrays, coords, np.asarray(bboxes, np.float32)

    def prepare(self, item: dict[str, Any]) -> dict[str, Any]:
        w, h = item['width'], item['height']
        arrays, coords, bboxes = self._size_constants(w, h)
        level_wx, level_wy, whole_wx, whole_wy = arrays
        return dict(
            output=item['output'],
            # host numpy: execute_batch stacks the batch's images into
            # ONE array so the whole batch rides a single transfer on
            # the dispatch; the size constants are device-resident
            image=self._pad_image(item['image']),
            level_wx=level_wx,
            level_wy=level_wy,
            whole_wx=whole_wx,
            whole_wy=whole_wy,
            coords=coords,  # host (n_blocks, 3) int32 (level, y, x)
            bboxes=bboxes,
        )

    def execute_batch(self, prepared: list[dict[str, Any]]) -> list[Any]:
        n = len(prepared)
        # pad the image count to a BUCKET, not straight to device_batch:
        # a DRY_RUN/tail batch of 3 images must not pay the full-batch
        # pyramid (24 x 7 x pad^2 levels) — one extra compilation per
        # bucket instead
        b_pad = min(self.device_batch, bucket(n, (1, 2, 4, 8, 16)))
        items = list(prepared)
        items += [items[-1]] * (b_pad - n)  # pad: ignored

        def gather(key):
            # per-item LISTS: blocks_step stacks them inside the jitted
            # program — one dispatch per batch instead of one eager
            # jnp.stack dispatch per argument
            return [it[key] for it in items]

        # Flat block list across the batch, bucketed so the ViT encodes
        # ~the real crop count instead of B * max_blocks padded rows
        # (real images have ~28 blocks vs the 48 worst-case at 640x640).
        offsets, flat = [], []
        for item in prepared:
            offsets.append(sum(len(f) for f in flat))
            c = item['coords']
            img_col = np.full((len(c), 1), len(flat), np.int32)
            flat.append(np.concatenate([img_col, c], axis=1))
        total = offsets[-1] + len(flat[-1]) if flat else 0
        t_pad = bucket(total, self.block_buckets)
        pad_rows = np.zeros((t_pad - total, 4), np.int32)
        coords = np.concatenate(flat + [pad_rows], axis=0)

        import jax

        emb = self.steps.blocks_step(
            # images: ONE stacked device_put from the dispatch thread —
            # device_put streams at full transfer rate and overlaps the
            # previous batch's compute. The alternatives both lose:
            # bytes riding the dispatch upload through the slow arg
            # path (22 MB of batch images -> ~20 img/s), and per-image
            # puts pay a ~10 ms round-trip init EACH (24 inits ->
            # ~69 img/s). The per-size constants stay device-resident
            # LISTS, stacked inside the program.
            jax.device_put(gather('image')),
            gather('level_wx'),
            gather('level_wy'), gather('whole_wx'), gather('whole_wy'),
            coords,
        )
        return [
            dict(
                _emb=emb,
                _i=i,
                _off=b_pad + offsets[i],
                _n=len(item['coords']),
                bboxes=item['bboxes'].astype(np.float16),
            )
            for i, item in enumerate(prepared)
        ]

    def finalize(self, record: dict[str, Any]) -> dict[str, Any]:
        emb = record.pop('_emb')
        i = record.pop('_i')
        off = record.pop('_off')
        n = record.pop('_n')
        # fetch the FULL batch array (jax caches the host copy, so the
        # other records of this batch hit the cache) and slice in
        # numpy — a device-side slice would dispatch + fetch per record
        emb = np.asarray(emb)
        record['embeddings'] = np.concatenate(
            [emb[i:i + 1], emb[off:off + n]], axis=0
        ).astype(np.float16)
        return record


def main(argv=None):
    return BlocksPipeline.main(argv)


if __name__ == '__main__':
    main()
