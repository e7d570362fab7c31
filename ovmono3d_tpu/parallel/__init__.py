"""Device-mesh construction and sharded train/eval steps."""
