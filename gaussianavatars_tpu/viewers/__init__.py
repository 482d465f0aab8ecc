"""Interactive viewers and the training-monitor wire protocol."""
