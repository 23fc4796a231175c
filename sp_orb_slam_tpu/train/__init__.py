"""Training utilities (SuperPoint-on-rendered-rooms; train/superpoint_train.py)."""
