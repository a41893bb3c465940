from .transformer import (DataTransformer, ClusterBasedNormalizer,  # noqa: F401
                          OneHotEncoder, SpanInfo)
from .datasets import interleave_float, load_tabular, DATASET_SPECS  # noqa: F401
