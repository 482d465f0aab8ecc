"""Training: losses, optimizer, train step, innovations, eval harness."""
