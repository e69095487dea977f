"""Multi-host (multi-process) initialization.

The reference initializes an NCCL process group at the top of every
entry point (``oadp/dp/train.py:61-63``, ``oadp/dp/test.py:50-52``,
``oadp/oake/base.py:122-126``, ``oadp/dp/test_nni.py:198-200``). The
TPU-native equivalent is ``jax.distributed.initialize()``: once per
process, before first jax use, it wires the coordinator and makes
``jax.process_index()/process_count()`` reflect the pod topology — the
OAKE pipelines then shard the image index space per process and the DP
trainer's ``data`` mesh spans all pod devices (ICI/DCN collectives are
inserted by XLA from the sharding annotations; SURVEY.md §2c).

Opt-in via ``OADP_DISTRIBUTED=1`` (plus the standard
``jax.distributed`` env/auto-detection on Cloud TPU) so single-chip
and CPU development setups stay untouched — mirroring the reference's
"CPU mode = no backend" branch (``oadp/dp/train.py:65-68``).
"""

__all__ = ['maybe_initialize_distributed', 'replicate_tree']

import os

_initialized = False


def replicate_tree(tree, sharding):
    """``device_put`` every leaf onto a replicated ``NamedSharding``,
    handling the multi-process quirk in ONE place (trainer + evaluator
    both need it): committed single-device arrays (e.g. orbax-restored
    checkpoints) cannot ``device_put`` directly onto a non-addressable
    sharding — the CPU/TPU backends refuse the implied cross-host
    transfer — so they round-trip through host memory first. Leaves
    already laid out equivalently to ``sharding`` pass through
    untouched (the in-train eval hands over the trainer's live carry)."""
    import jax
    import numpy as np

    def put(x):
        if isinstance(x, jax.Array):
            if x.sharding.is_equivalent_to(sharding, x.ndim):
                return x
            if jax.process_count() > 1:
                x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def maybe_initialize_distributed() -> bool:
    """Initialize ``jax.distributed`` when ``OADP_DISTRIBUTED=1``.

    Returns True when running (or already) initialized. Safe to call
    from every CLI entry point; repeated calls are no-ops.
    """
    global _initialized
    if _initialized:
        return True
    if os.environ.get('OADP_DISTRIBUTED', '').lower() not in (
        '1', 'true', 'yes'
    ):
        return False
    import jax
    # On Cloud TPU the coordinator/process ids are auto-detected; other
    # platforms use the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID env vars handled inside jax.distributed.
    jax.distributed.initialize()
    _initialized = True
    from .logging import logger
    logger.info(
        'jax.distributed initialized: process %d/%d, %d local / %d '
        'global devices',
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True
