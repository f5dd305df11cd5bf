from .ann import (
    cosine_topk_ivf,
    cosine_topk_ivf_served,
    ivf_assign,
    ivf_centroids_random,
    train_ivf_centroids,
    write_ivf_index,
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    knn_join,
    lsh_hyperplane_buckets,
)

__all__ = [
    "cosine_topk_ivf",
    "cosine_topk_ivf_served",
    "ivf_assign",
    "ivf_centroids_random",
    "train_ivf_centroids",
    "write_ivf_index",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "knn_join",
    "lsh_hyperplane_buckets",
]
