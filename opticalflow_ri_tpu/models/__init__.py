"""Dense optical flow solvers (adapters + jitted functional cores)."""
