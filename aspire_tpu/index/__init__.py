from .build import MultiVecIndex, build_index_from_reps, encode_corpus
from .serve import l2max_search, sharded_l2max_search, ot_rerank
from .dense import DenseBucketIndex, build_dense_index, make_dense_search
