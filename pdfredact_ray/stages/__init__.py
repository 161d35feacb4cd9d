"""Ray Data batch stages: callable classes for ``map_batches`` actor pools."""
