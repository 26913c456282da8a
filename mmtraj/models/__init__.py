from mmtraj.models.forecaster import (  # noqa: F401
    Forecaster,
    init_params,
)
