from . import logging_utils, profiling, ptp_vis, vis
