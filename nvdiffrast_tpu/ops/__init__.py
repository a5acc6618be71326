"""Differentiable rendering primitive ops (JAX/XLA/Pallas)."""
