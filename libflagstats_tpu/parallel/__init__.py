from .sharded import data_mesh, flagstat_sharded, make_sharded_counter_fn  # noqa: F401
