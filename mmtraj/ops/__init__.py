from mmtraj.ops.fused_gat import fused_gat, gat_math  # noqa: F401
