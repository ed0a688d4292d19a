from .sharding import (make_mesh, param_shardings, input_sharding,
                       shard_program)

__all__ = ["make_mesh", "param_shardings", "input_sharding", "shard_program"]
