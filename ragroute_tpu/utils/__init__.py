"""Host-side utilities: templating, timing, logging."""
