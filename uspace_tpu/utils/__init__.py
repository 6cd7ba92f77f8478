from . import logging_utils, misc, profiling, ptp_vis, vis
