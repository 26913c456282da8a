from mmtraj.graph.adjacency import pairwise_sq_dists, proximity_adjacency  # noqa: F401
