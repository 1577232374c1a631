"""CLI applications: train (all four reference modes), eval, cache, tiny."""
