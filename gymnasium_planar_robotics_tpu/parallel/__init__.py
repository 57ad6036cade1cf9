"""Device-mesh sharding of env batches and collective metrics."""
