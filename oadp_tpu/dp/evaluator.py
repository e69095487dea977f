"""Detection evaluation loop: sharded inference → COCO metrics.

Replaces the reference's ``single_gpu_test``/``multi_gpu_test`` + rank-0
``dataset.evaluate`` path (``oadp/dp/test.py:65-85``): batches are
padded to a static size (repeating the tail), results deduped by image
id, boxes rescaled back to original coordinates, and metrics produced by
the in-repo ``CocoEvaluator`` with the OV triple summary.

DUMP mode (reference ``oadp/dp/roi_heads.py:131-166``): when
``Store.DUMP`` points at a directory, per-image raw logits records are
written as fp16 ``.pth`` files and dummy metrics are returned — the NNI
post-hoc calibration consumes these.
"""

__all__ = ['DetEvaluator']

import functools
import os
import pathlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..base import Categories
from ..models import detector as DET
from ..utils import PthAccessLayer, Store, logger, replicate_tree
from .builder import canvas_anchors
from .coco_eval import CocoEvaluator, ov_coco_summary
from .datasets import (
    BatchBuilder,
    CocoDetDataset,
    Loader,
    TestTransform,
    batch_canvas,
    unpack_batch,
)
from .lvis_eval import LvisEvaluator, ov_lvis_summary


class DetEvaluator:

    def __init__(
        self,
        dataset: CocoDetDataset,
        config,  # DetectorConfig
        categories: Categories,
        batch_size: int = 1,
        canvas: tuple[int, int] = (832, 1344),
        scale: tuple[int, int] = (1333, 800),
        bf16: bool = False,
        eval_type: str = 'ov_coco',
        n_devices: int = 0,
        work_dir: pathlib.Path | str | None = None,
    ) -> None:
        self.dataset = dataset
        self.config = config
        self.categories = categories
        self.batch_size = batch_size
        self.bf16 = bf16
        self.eval_type = eval_type
        # multi-host gather exchange root: the work dir is the one path
        # every rank already shares (checkpoints/logs live there) — /tmp
        # is per-host and would strand non-rank-0 parts
        self.work_dir = work_dir
        # batches shard over a 1-D data mesh (replacing the reference's
        # per-rank DDP test loop, oadp/dp/test.py:65-85); batch_size is
        # PER PROCESS and must be a multiple of the local device count
        if jax.process_count() > 1:
            devices = jax.devices()  # global mesh (see Trainer)
            local = jax.local_device_count()
        else:
            devices = jax.devices()[:n_devices or 1]
            local = len(devices)
        self.mesh = Mesh(np.asarray(devices), ('data',))
        self.repl = NamedSharding(self.mesh, PartitionSpec())
        self.shard = NamedSharding(self.mesh, PartitionSpec('data'))
        if batch_size % local:
            raise ValueError(
                f'batch_size {batch_size} not divisible by '
                f'{local} local devices'
            )
        builder = BatchBuilder(
            canvas=canvas, with_clip=False,
            num_all=categories.num_all,
            pack=True,  # ONE transfer per eval batch (datasets.pack_batch)
        )
        self.loader = Loader(
            dataset, builder, batch_size, TestTransform(scale),
            shuffle=False,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        self._jit: dict[tuple, Any] = {}
        self._dump = (
            PthAccessLayer(Store.DUMP, readonly=False)
            if Store.DUMP else None
        )

    def _fn(self, canvas: tuple, pack_spec: tuple = ()):
        if canvas not in self._jit:
            # Cold-start hazard: the full simple_test program (detector
            # + calibrated ensemble + blocked multiclass NMS) takes
            # ~14 min to compile on a v5e the FIRST time. The persisted
            # compilation cache (utils.enable_compilation_cache, on by
            # default in the CLIs) makes every later run seconds; warn
            # so an apparently-hung eval is explainable.
            logger.info(
                'compiling eval program for canvas %s — first-ever '
                'compile takes minutes (persisted compilation cache '
                'makes reruns fast)', canvas,
            )
            anchors = canvas_anchors(self.config, canvas)
            test_fn = functools.partial(
                DET.simple_test,
                config=self.config,
                level_anchors=anchors,
            )
            act_dtype = jnp.bfloat16 if self.bf16 else jnp.float32
            dump = self._dump is not None

            def run(params, stats, batch):
                if pack_spec:  # one flat uint8 buffer -> field dict
                    batch = unpack_batch(batch['packed'], pack_spec)
                else:
                    batch = dict(batch)
                # uint8 loader canvases -> normalized activations
                # (models.detector.ingest_images), fused into the
                # jitted forward
                batch['images'] = DET.ingest_images(
                    batch['images'], act_dtype
                )
                out = test_fn(params, stats, batch)
                # Pack the fetch: the tunneled transport pays one
                # serialized round trip PER FETCHED LEAF (~22-60 ms
                # each — fetching simple_test's 12-leaf dict cost
                # ~200 ms/batch vs the 53 ms device program). Ship only
                # what this mode consumes, concatenated into ONE
                # buffer; _consume/_write_dump unpack host-side.
                if dump:
                    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
                    return {'dump': jnp.concatenate([
                        f32(out['boxes']),
                        f32(out['bbox_logits']),
                        f32(out['object_logits']),
                        f32(out['objectness'])[..., None],
                        f32(out['proposal_valid'])[..., None],
                    ], -1)}
                res = {'packed': jnp.concatenate([
                    jnp.asarray(out['dets'], jnp.float32),
                    jnp.asarray(out['labels'], jnp.float32)[..., None],
                    jnp.asarray(out['valid'], jnp.float32)[..., None],
                ], -1)}
                if out.get('masks') is not None:
                    # fp16 halves the (B, M, 28, 28) mask stream;
                    # sigmoid probs lose <6e-4 — far inside the mask
                    # rasterization deviation bound (ops/masks.py)
                    res['masks'] = out['masks'].astype(jnp.float16)
                return res

            # Pin the output to the batch sharding: nothing else forces
            # XLA's choice for these small outputs, and _fetch_local
            # reads each process's addressable shards as "the rows this
            # process loaded" — a replicated output would hand every
            # rank rank-0's rows.
            self._jit[canvas] = jax.jit(run, out_shardings=self.shard)
        return self._jit[canvas]

    def _replicate(self, tree):
        """Replicate the model over the (possibly multi-process) mesh
        (shared multi-process quirk handling: ``utils.replicate_tree``).
        """
        return replicate_tree(tree, self.repl)

    def run(self, params, stats) -> dict[str, float]:
        results: dict[int, list[dict]] = {}
        n_done = 0
        # replicate the model ONCE — a device_put inside the batch loop
        # would re-upload the full detector every batch (hundreds of MB
        # per step over a tunneled transport)
        params = self._replicate(params)
        stats = self._replicate(stats)
        # dispatch batch k, then fetch + postprocess batch k-1 while the
        # device runs k (the OAKE runner's proven overlap shape —
        # oake/base.py); `pending` holds one in-flight batch
        pending = None
        for batch in self.loader.epoch(0):
            ids = batch['image_ids']
            scale = batch['scale_factor']
            b = len(ids)
            spec = batch.get('_pack_spec', ())
            device_batch = {
                k: v for k, v in batch.items()
                if k not in ('image_ids', 'scale_factor', '_pack_spec')
            }
            # images ship in the loader's dtype (uint8): normalization
            # and the activation-dtype cast are fused into the jitted
            # forward (_fn)
            if b < self.batch_size:  # pad tail batch to the static size
                pad = self.batch_size - b
                device_batch = {
                    k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                    for k, v in device_batch.items()
                }
            # ONE batched put for the whole tree (tunneled transports
            # serialize per-call round trips). Multi-process: this
            # process's rows form its local part of the global batch.
            if jax.process_count() > 1:
                device_batch = jax.tree.map(
                    functools.partial(
                        jax.make_array_from_process_local_data,
                        self.shard,
                    ),
                    device_batch,
                )
            else:
                device_batch = jax.device_put(device_batch, self.shard)
            out = self._fn(batch_canvas(batch), spec)(
                params, stats, device_batch,
            )  # async dispatch
            if pending is not None:
                n_done += self._consume(results, *pending)
                if n_done % (50 * self.batch_size) == 0:
                    logger.info(
                        'eval: %d/%d images', n_done, len(self.dataset)
                    )
            pending = (out, ids, scale, b)
        if pending is not None:
            n_done += self._consume(results, *pending)

        if self._dump is not None:
            logger.info('DUMP mode: wrote %d records, skipping metrics',
                        len(results))
            if jax.process_count() > 1:
                # ranks finish writing at different times — barrier so a
                # driver chaining dp.test straight into calibration on
                # rank 0 never reads a store other ranks are still
                # writing
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices('dump_complete')
            return {}
        return self._metrics(results)

    @staticmethod
    def _fetch_local(x) -> np.ndarray:
        """Fetch THIS process's rows of a batch-sharded output (a
        global sharded array is not fully addressable off-process;
        each process postprocesses only the images it loaded)."""
        if jax.process_count() == 1:
            return np.asarray(x)
        shards = sorted(
            x.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], 0)

    def _consume(self, results, out, ids, scale, b) -> int:
        out = jax.tree.map(self._fetch_local, out)  # fetch
        for i in range(b):
            img_id = int(ids[i])
            if img_id in results:
                continue
            if self._dump is not None:
                self._write_dump(img_id, out['dump'][i], scale[i])
                results[img_id] = []
                continue
            packed = out['packed'][i]  # (M, 7): dets | label | valid
            dets = packed[:, :5]
            labels = packed[:, 5].astype(np.int64)
            valid = packed[:, 6] > 0.5
            masks = out.get('masks')
            boxes = dets[:, :4] / scale[i]  # back to original coords
            res = []
            for j in np.nonzero(valid)[0]:
                x0, y0, x1, y1 = boxes[j]
                det = dict(
                    image_id=img_id,
                    category_id=self.dataset.cat_ids[int(labels[j])],
                    bbox=[
                        float(x0), float(y0),
                        float(x1 - x0), float(y1 - y0),
                    ],
                    score=float(dets[j, 4]),
                )
                if masks is not None:
                    det['mask'] = masks[i, j]
                res.append(det)
            results[img_id] = res
        return b

    def _metrics(
        self, results: dict[int, list[dict]]
    ) -> dict[str, float]:
        # Gather (image_id, detections) PAIRS and dedup by image id at
        # the rank-0 merge: batch-count padding repeats whole batches,
        # and a repeat can land on a DIFFERENT rank than the original
        # (datasets.Loader._index_batches pads each aspect group to a
        # multiple of process_count) — per-rank dedup in _consume can't
        # see it, and double-counted images would silently inflate
        # every duplicated TP into an extra unmatched FP.
        parts = self._gather(sorted(results.items()))
        if parts is None:  # non-zero process: rank 0 evaluates
            return {}
        merged: dict[int, list[dict]] = {}
        for img_id, res in parts:
            merged.setdefault(img_id, res)
        detections = [d for res in merged.values() for d in res]
        if self.eval_type == 'lvis':
            metrics = {}
            bbox_eval = LvisEvaluator(
                self.dataset.dataset, self.dataset.cat_ids,
                iou_type='bbox',
            )
            bbox_eval.evaluate(detections)
            metrics.update(ov_lvis_summary(bbox_eval))
            if detections and 'mask' in detections[0]:
                segm_eval = LvisEvaluator(
                    self.dataset.dataset, self.dataset.cat_ids,
                    iou_type='segm',
                )
                segm_eval.evaluate(detections)
                metrics.update(ov_lvis_summary(segm_eval))
            return metrics
        evaluator = CocoEvaluator(
            self.dataset.dataset, self.dataset.cat_ids,
            max_dets=(100, 300, 1000),
        )
        evaluator.evaluate(detections)
        return ov_coco_summary(
            evaluator, self.categories.num_bases, self.categories.num_novels
        )

    #: monotonic per-evaluator round id — namespaces gather files so a
    #: rerun never reads a previous round's parts
    _gather_round = 0

    def _gather(
        self,
        payload: list,
        process_index: int | None = None,
        process_count: int | None = None,
        root: pathlib.Path | str | None = None,
        barrier=None,
        timeout_s: float = 600.0,
    ) -> list | None:
        """Multi-host gather of an arbitrary picklable list over the
        shared filesystem (the reference all-gathers python objects
        over NCCL, ``oadp/dp/test_nni.py:144-150``; OAKE-style file
        exchange keeps this backend-free). ``_metrics`` passes
        ``(image_id, detections)`` pairs. Single-process: identity.
        The exchange root
        defaults to the run's ``work_dir`` — the path every rank
        already shares — falling back to ``Store.DUMP`` and only then
        to ``/tmp`` (which is per-host, so a real multi-host run
        without a work dir would time out waiting for remote parts).

        Each part is written to a temp file then atomically renamed, so
        a part's existence implies it is complete — no partial reads.
        Every rank overwrites (``os.replace``) its own part BEFORE the
        barrier, and rank 0 merges only after the barrier, so a merge
        can never read a stale part left by a crashed earlier run: each
        part read this round was freshly published this round. Rank 0
        unlinks the parts after merging so rounds don't accumulate on
        the shared filesystem. The injectable ``process_index``/
        ``process_count``/``barrier`` exist for tests; production uses
        jax's process topology and the multihost device barrier.
        """
        pc = jax.process_count() if process_count is None else process_count
        if pc == 1:
            return payload
        pi = jax.process_index() if process_index is None else process_index
        import pickle
        import tempfile
        import time as time_mod
        rnd = DetEvaluator._gather_round
        DetEvaluator._gather_round += 1
        root = pathlib.Path(
            root if root is not None
            else (
                self.work_dir
                or Store.DUMP
                or tempfile.gettempdir()  # single-host last resort
            )
        ) / 'eval_gather'
        root.mkdir(parents=True, exist_ok=True)
        final = root / f'round{rnd:04d}_part_{pi:04d}.pkl'
        tmp = final.with_suffix('.tmp')
        with open(tmp, 'wb') as f:
            pickle.dump(payload, f)
        os.replace(tmp, final)  # atomic publish
        if barrier is None:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f'eval_gather_{rnd}')
        else:
            barrier()
        if pi != 0:
            return None
        merged: list[dict] = []
        deadline = time_mod.monotonic() + timeout_s
        for p in range(pc):
            part = root / f'round{rnd:04d}_part_{p:04d}.pkl'
            while not part.exists():
                if time_mod.monotonic() > deadline:
                    raise TimeoutError(
                        f'eval gather: {part} missing after '
                        f'{timeout_s}s'
                    )
                time_mod.sleep(0.1)
            with open(part, 'rb') as f:
                merged.extend(pickle.load(f))
        for p in range(pc):  # don't accumulate parts across rounds/runs
            (root / f'round{rnd:04d}_part_{p:04d}.pkl').unlink(
                missing_ok=True
            )
        return merged

    def _write_dump(self, img_id: int, packed: np.ndarray, scale) -> None:
        # unpack the single-fetch buffer built in _fn:
        # boxes(4) | bbox_logits(C+1) | object_logits(C+1) | obj(1) | valid(1)
        c1 = (packed.shape[-1] - 6) // 2
        boxes = packed[:, :4]
        bbox_logits = packed[:, 4:4 + c1]
        object_logits = packed[:, 4 + c1:4 + 2 * c1]
        objectness = packed[:, -2]
        valid = packed[:, -1] > 0.5

        def half(x):
            # masked logits carry -1e10 (our finite -inf); store as the
            # reference's literal -inf rather than overflow the cast
            x = np.where(x < -1e9, -np.inf, x)
            return x.astype(np.float16)

        # the reference dumps RESCALED boxes (simple_test_bboxes with
        # rescale=True, oadp/dp/roi_heads.py:131-166) — test_calibrate
        # evaluates records directly against original-coordinate annots
        record = {
            'bboxes': half(boxes[valid] / np.asarray(scale)),
            'bbox_logits': half(bbox_logits[valid]),
            'object_logits': half(object_logits[valid]),
            'objectness': half(objectness[valid]),
        }
        self._dump[f'{img_id:012d}'] = record
