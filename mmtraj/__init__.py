"""mmtraj — TPU-native multimodal trajectory forecasting.

A brand-new JAX/XLA/Pallas framework with the capabilities of
`serenetech90/multimodaltraj_2` (see SURVEY.md): per-frame social graphs from
agent XY proximity, multi-head graph attention over LSTM/GRU encoder-decoder
recurrence, bivariate-Gaussian-mixture multimodal heads, and best-of-K ADE/FDE
evaluation on the ETH/UCY leave-one-out protocol.

Everything compiles to fixed-shape padded/masked tensors: graph construction on
device, recurrence as `jax.lax.scan`, K=20 modes via `vmap`, hot matmuls
fusable into batched Pallas kernels, and data parallelism over a
`jax.sharding.Mesh` (capability contract: BASELINE.json:5-12; the reference
repo itself was not mounted in this environment — SURVEY.md §0).
"""

__version__ = "0.1.0"

from mmtraj.config import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    PRESETS,
    get_config,
)


def __getattr__(name):  # lazy top-level API (keeps `import mmtraj` light)
    if name == "Forecaster":
        from mmtraj.models.forecaster import Forecaster

        return Forecaster
    if name == "fit":
        from mmtraj.train import fit

        return fit
    if name == "evaluate":
        from mmtraj.evaluate import evaluate

        return evaluate
    if name == "fit_population":
        from mmtraj.population import fit_population

        return fit_population
    if name == "checkpoint":
        import mmtraj.checkpoint as checkpoint

        return checkpoint
    if name == "PredictServer":
        from mmtraj.serve import PredictServer

        return PredictServer
    raise AttributeError(f"module 'mmtraj' has no attribute {name!r}")
