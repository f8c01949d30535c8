from webgraph_ray.functions.hashing import hash_keys, hash_key  # noqa: F401
