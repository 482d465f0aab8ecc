"""Model state: Gaussian parameter pytrees, FLAME head model, mesh binding."""
