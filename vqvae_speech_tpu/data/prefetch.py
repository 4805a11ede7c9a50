"""Double-buffered host->device input pipeline.

The reference feeds the GPU synchronously from DataLoader workers
(reference src/experiments/base_trainer.py:51-59 + .to(device) copies inside
the step, convolutional_trainer.py:45-47).  TPU-native replacement: a
background thread stages the NEXT batch onto device (optionally sharded over
the mesh) while the current step runs — the device never waits on PCIe.
"""
import queue
import threading

import jax


def prefetch_to_device(iterator, size: int = 2, mesh=None):
    """Wrap a host batch iterator; yields device-resident batches.

    With a mesh, batches are placed sharded over the ``data`` axis.
    """
    if mesh is not None:
        from vqvae_speech_tpu.parallel.mesh import shard_batch

        def put(batch):
            return shard_batch(batch, mesh)
    else:
        def put(batch):
            return jax.tree_util.tree_map(jax.device_put, batch)

    q = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item
