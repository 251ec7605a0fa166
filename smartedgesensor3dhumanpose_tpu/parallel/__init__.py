"""Multi-chip execution: mesh construction and sharded pipeline runners."""
