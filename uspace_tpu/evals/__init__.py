from . import fid, inception, sampling
