"""Multi-device distribution: mesh construction and sharded stepping."""
