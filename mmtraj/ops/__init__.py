"""Pallas TPU kernels (opt-in; the XLA paths stay canonical).

Submodules are exported as modules — do NOT re-export the `fused_gat`
FUNCTION here: it would shadow the `mmtraj.ops.fused_gat` submodule
attribute, breaking `import mmtraj.ops.fused_gat as m` (binds the function,
not the module).  Import the kernels from their submodules:
``from mmtraj.ops.fused_gat import fused_gat, gat_math``.
"""

from mmtraj.ops import fused_decoder, fused_gat  # noqa: F401
