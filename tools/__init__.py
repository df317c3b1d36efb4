"""Post-processing toolchain for xpic_tpu output.

Counterpart of the reference's tools/ package (tools/configuration.py +
tools/plotting/): config-driven binary readers (data_format), frame and
table plotting (plots), and the `python -m tools` CLI.
"""

from .data_format import (DistributionReader, RegionReader, RunInfo,
                          read_temporal)
from .plots import Panel, make_movie, plot_temporal, process_frames
from .analysis import (align_with_field, average_over_tube, check_consistency,
                       find_correct_timestep, is_correct_timestep,
                       phi_average, polar_maps, select_magnetic_tube,
                       vx_vy_to_vr_va, wk_inverse, wk_spectrum)

__all__ = [
    "DistributionReader", "RegionReader", "RunInfo", "read_temporal",
    "Panel", "make_movie", "plot_temporal", "process_frames",
    "wk_spectrum", "wk_inverse", "is_correct_timestep", "check_consistency",
    "find_correct_timestep", "polar_maps", "vx_vy_to_vr_va", "phi_average",
    "select_magnetic_tube", "average_over_tube", "align_with_field",
]
