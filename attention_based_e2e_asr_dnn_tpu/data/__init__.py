from attention_based_e2e_asr_dnn_tpu.data.datasets import (  # noqa: F401
    AsrTrainDevDataset,
    AsrTestDataset,
    ToyTrainDevDataset,
    ToyTestDataset,
    LmTrainDevDataset,
    LmTestDataset,
)
from attention_based_e2e_asr_dnn_tpu.data.batching import (  # noqa: F401
    Batch,
    BucketBatcher,
    ThreadedPrefetcher,
    pad_to_multiple,
)
from attention_based_e2e_asr_dnn_tpu.data.lazy import (  # noqa: F401
    LazyAsrTestDataset,
    LazyAsrTrainDevDataset,
    LazyFeatureSource,
)
from attention_based_e2e_asr_dnn_tpu.data.specaug import specaugment  # noqa: F401
