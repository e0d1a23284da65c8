"""map_batches stages: stateless batch fns + stateful actor-pool classes."""
