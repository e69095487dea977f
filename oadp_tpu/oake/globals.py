"""OAKE globals: whole-image CLIP embeddings (reference
``oadp/oake/globals.py``). Output per image: a ``(512,)`` fp16 tensor in
``{output_dir}/{id:012d}.pth``.

Images are batched across the dataset (static bucket sizes) so the
preprocessing matmuls and the ViT forward run at MXU-friendly batch
sizes — unlike the reference's one-image-per-iter loop
(globals.py:49-60).
"""

__all__ = ['GlobalsPipeline', 'main']

from typing import Any

import numpy as np

from ..ops import preprocess as P
from .base import BaseOakePipeline, bucket


class GlobalsPipeline(BaseOakePipeline):

    def __init__(self, *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.device_batch = int(self.config.get('batch_size', 16))

    def prepare(self, item: dict[str, Any]) -> dict[str, Any]:
        wx, wy = P.clip_transform_matrices(
            item['width'], item['height'], None, self.pad, self.pad
        )
        return dict(
            output=item['output'],
            image=self._pad_image(item['image']),
            wx=wx,
            wy=wy,
        )

    def execute_batch(self, prepared: list[dict[str, Any]]) -> list[Any]:
        n = len(prepared)
        b = bucket(n, (self.device_batch,))
        images = np.zeros((b, self.pad, self.pad, 3), np.uint8)
        wx = np.zeros((b, 224, self.pad), np.float32)
        wy = np.zeros((b, 224, self.pad), np.float32)
        for i, item in enumerate(prepared):
            images[i] = item['image']
            wx[i] = item['wx']
            wy[i] = item['wy']
        emb = np.asarray(self.steps.globals_step(images, wx, wy))
        return [emb[i].astype(np.float16) for i in range(n)]


def main(argv=None):
    return GlobalsPipeline.main(argv)


if __name__ == '__main__':
    main()
