from mmtraj.data.parser import read_annotation_file, scene_arrays  # noqa: F401
from mmtraj.data.windower import make_windows  # noqa: F401
from mmtraj.data.transforms import (  # noqa: F401
    NormStats,
    compute_norm_stats,
    denormalize,
    integrate,
    normalize,
    to_relative,
)
from mmtraj.data.collate import WindowDataset, pad_windows  # noqa: F401
from mmtraj.data.obsmat import convert_obsmat, read_obsmat  # noqa: F401
from mmtraj.data.vsp import convert_vsp, parse_vsp  # noqa: F401
from mmtraj.data.registry import leave_one_out, load_scene_windows, load_split  # noqa: F401
