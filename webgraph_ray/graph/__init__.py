from webgraph_ray.graph.engine import GraphEngine  # noqa: F401
