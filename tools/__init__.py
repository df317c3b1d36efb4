"""Post-processing toolchain for xpic_tpu output.

Counterpart of the reference's tools/ package (tools/configuration.py +
tools/plotting/): config-driven binary readers (data_format), frame and
table plotting (plots), and the `python -m tools` CLI.
"""

from .data_format import (DistributionReader, RegionReader, RunInfo,
                          read_temporal)
from .plots import Panel, make_movie, plot_temporal, process_frames

__all__ = [
    "DistributionReader", "RegionReader", "RunInfo", "read_temporal",
    "Panel", "make_movie", "plot_temporal", "process_frames",
]
