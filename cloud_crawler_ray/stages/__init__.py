"""Ray Data stage callables (map_batches / map_groups bodies)."""
