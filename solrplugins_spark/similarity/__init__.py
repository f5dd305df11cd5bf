from .ann import cosine_topk_bruteforce, lsh_hyperplane_buckets, cosine_topk_lsh

__all__ = ["cosine_topk_bruteforce", "lsh_hyperplane_buckets", "cosine_topk_lsh"]
