"""runtime helpers: multi-host init no-op semantics + process sharding."""
import numpy as np

from tda_eeg_audio_tpu.runtime import init_distributed, process_shard


def test_init_distributed_single_process_noop():
    info = init_distributed(None, None, None)
    assert info["num_processes"] == 1
    assert info["process_id"] == 0
    assert info["local_devices"] == info["devices"] >= 1


def test_process_shard_single_process():
    assert process_shard(100) == (0, 100)
    assert process_shard(0) == (0, 0)


def test_process_shard_partition_properties():
    """The deterministic multi-process slice: balanced, gap-free, ordered
    (mirrors the reference BATCH_START/BATCH_END contract,
    tda_eeg_classification_v2.py:54-60)."""
    def shard(p, np_, n):
        per = -(-n // np_)
        return min(p * per, n), min((p + 1) * per, n)

    for n in (0, 1, 7, 45, 1416):
        for np_ in (1, 2, 3, 8):
            spans = [shard(p, np_, n) for p in range(np_)]
            cover = np.concatenate([np.arange(a, b) for a, b in spans]) \
                if n else np.array([])
            np.testing.assert_array_equal(cover, np.arange(n))
            sizes = [b - a for a, b in spans]
            assert max(sizes) - min(sizes) <= -(-n // np_)
