from pinn.parallel.mesh import (
    make_mesh, shard_points, replicate, pad_points_with_weights)
