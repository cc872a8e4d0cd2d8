"""Registry, CLI helpers, metrics logging."""
