from . import datasets, extraction, loader, raw
