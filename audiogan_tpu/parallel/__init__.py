from audiogan_tpu.parallel.mesh import (make_mesh, batch_sharding,
                                        replicated_sharding, state_shardings)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "state_shardings"]
