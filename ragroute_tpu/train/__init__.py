"""Offline training: the corpus-router classifier, in JAX/optax."""
