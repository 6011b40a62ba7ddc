from .aug_store import AugStore, snr_range_for_key
from .dataset import (
    EvalPipeline,
    NativeTrainPipeline,
    PrefetchPipeline,
    TrainPipeline,
    TrainPipelineConfig,
    buffer_shuffle,
    chunk_samples_for_frames,
    iter_feat_list,
    iter_raw_list,
    iter_tar_shards,
    load_data_list,
    shard_list_for_rank,
)
from .wav_io import read_wav, read_wav_bytes, write_wav

__all__ = [
    "AugStore",
    "snr_range_for_key",
    "EvalPipeline",
    "NativeTrainPipeline",
    "PrefetchPipeline",
    "TrainPipeline",
    "TrainPipelineConfig",
    "buffer_shuffle",
    "chunk_samples_for_frames",
    "iter_feat_list",
    "iter_raw_list",
    "iter_tar_shards",
    "load_data_list",
    "shard_list_for_rank",
    "read_wav",
    "read_wav_bytes",
    "write_wav",
]
