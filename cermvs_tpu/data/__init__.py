"""Dataset registry and loader factories.

API parity with ``/root/reference/datasets/__init__.py:9-46``:
``get_test_data_loader`` (un-batched, ordered, optional (start, end, step)
subset) and ``get_train_data_loader`` (shuffled, drop_last) over the
registered adapters, on the torch-free threaded loader runtime.
"""

from __future__ import annotations

from cermvs_tpu.config import configurable
from cermvs_tpu.data.blended import Blended
from cermvs_tpu.data.custom import Custom
from cermvs_tpu.data.dtu import DTU, DTUTest
from cermvs_tpu.data.loader import DataLoader, Dataset
from cermvs_tpu.data.tnt import TNT

dataset_dict = {
    "DTU": DTU,
    "DTUTest": DTUTest,
    "Blended": Blended,
    "TNT": TNT,
    "Custom": Custom,
}


@configurable("get_test_data_loader")
def get_test_data_loader(datasetname=None, num_frames=10, subset=None,
                         num_workers=4, **args):
    if subset is not None:
        start, end, step = subset
        subset = list(range(start, end, step))
    dataset = dataset_dict[datasetname](
        num_frames=num_frames, subset=subset, **args)
    return DataLoader(dataset, batch_size=None, shuffle=False,
                      num_workers=num_workers)


@configurable("get_train_data_loader")
def get_train_data_loader(datasetname=None, batch_size=2, num_frames=10,
                          num_workers=4, seed=0, process_shard=None, **args):
    """``process_shard`` defaults to (jax.process_index(), process_count)
    when running multi-host (host-local sharded loading)."""
    if process_shard is None:
        try:
            import jax

            if jax.process_count() > 1:
                process_shard = (jax.process_index(), jax.process_count())
        except Exception:
            pass
    dataset = dataset_dict[datasetname](num_frames=num_frames, **args)
    return DataLoader(dataset, batch_size=batch_size, shuffle=True,
                      drop_last=True, num_workers=num_workers, seed=seed,
                      process_shard=process_shard)
