"""Legacy Waymo pipeline compatibility (reference
``pcdet/datasets/waymo_old/`` — a near-identical older snapshot of the
``waymo/`` pipeline kept by the reference for reproducing pre-refactor
infos; it is wired into no registry or config there either).

We re-export the current implementation: the legacy and current reference
modules differ only in minor bookkeeping (see reference waymo_old/
waymo_dataset.py vs waymo/waymo_dataset.py), and infos produced by either
load identically through WaymoDataset.
"""
from ..waymo.waymo_dataset import WaymoDataset, create_waymo_infos  # noqa: F401
from ..waymo import waymo_utils  # noqa: F401
